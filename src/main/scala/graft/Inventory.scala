package graft

/** Doc-time source of truth for the README's inventory counts, derived
  * from [[SparkEntry]] itself — never do running arithmetic in docs (the
  * count drifted twice during round 3 before being corrected).
  *
  * Usage: sbt "runMain graft.Inventory"
  */
object Inventory {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.size
    val o = SparkEntry.oracleSql.size
    println(s"queries=$q oracle_checked=$o rows_only=${q - o} " +
      s"skips=${SparkEntry.skipList.size}")
  }
}
