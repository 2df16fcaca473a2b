package graft.plans

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Fault-injection operator — the analogue of the reference's `ChaosExec`
  * (`core/src/execution_plans/chaos_exec.rs:18-30`, planner rule
  * `scheduler/src/state/aqe/optimizer_rule/chaos_exec.rs:17-35`, plus the
  * `chaos-testing` crate): wraps a subtree and makes the FIRST attempt of
  * chosen partitions throw, so stage/task retry paths can be exercised
  * deterministically.
  *
  * This is the full custom-operator wiring of SURVEY §7 path (c):
  * a logical [[ChaosNode]], a [[SparkStrategy]] planning it to a physical
  * [[ChaosExec]], registered through `SparkSessionExtensions`
  * (GraftExtensions.install → injectPlannerStrategy).
  */
object Chaos {

  /** transient-fault bookkeeping: (runId, partition) → attempts seen. */
  private val attempts = new ConcurrentHashMap[(String, Int), AtomicInteger]()

  def attemptCount(runId: String): Int =
    attempts.keySet().stream().filter(_._1 == runId).mapToInt(k =>
      attempts.get(k).get()).sum()

  private[plans] def registerAttempt(runId: String, partition: Int): Int =
    attempts.computeIfAbsent((runId, partition), _ => new AtomicInteger())
      .getAndIncrement()

  /** Logical marker: fail the first attempt of `failPartition` — or EVERY
    * attempt when `fatal` (the reference's terminal `FailedTask` path,
    * `core/proto/ballista.proto:607-679`: a task whose failure reason is
    * non-retryable fails the job rather than rescheduling forever).
    * `delayMs > 0` instead injects a straggler: the partition sleeps
    * before streaming (the reference ChaosExec's delay mode,
    * `chaos_exec.rs:18-30` transient/fatal/panic/delay matrix). */
  case class ChaosNode(child: LogicalPlan, runId: String, failPartition: Int,
                       fatal: Boolean = false, delayMs: Long = 0L)
      extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(c: LogicalPlan): ChaosNode =
      copy(child = c)
  }

  /** Plans ChaosNode → ChaosExec (the §7 path-(c) SparkStrategy). */
  object ChaosStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case ChaosNode(child, runId, failPartition, fatal, delayMs) =>
        ChaosExec(planLater(child), runId, failPartition, fatal,
          delayMs) :: Nil
      case _ => Nil
    }
  }

  /** Physical pass-through that throws on the first attempt of one
    * partition — retried attempts stream the child normally, unless
    * `fatal`, in which case every attempt throws and Spark gives up after
    * spark.task.maxFailures, surfacing the chaos error to the caller;
    * `delayMs` makes the target partition a straggler instead. */
  case class ChaosExec(child: SparkPlan, runId: String, failPartition: Int,
                       fatal: Boolean = false, delayMs: Long = 0L)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning = child.outputPartitioning
    override def outputOrdering = child.outputOrdering
    override protected def withNewChildInternal(c: SparkPlan): ChaosExec =
      copy(child = c)

    override protected def doExecute(): RDD[InternalRow] = {
      val id = runId
      val target = failPartition
      val isFatal = fatal
      val delay = delayMs
      child.execute().mapPartitionsWithIndex { (pid, it) =>
        val attempt = Chaos.registerAttempt(id, pid)
        if (pid == target && delay > 0L) {
          Thread.sleep(delay) // straggler: slow, not failing
        } else if (pid == target && isFatal) {
          throw new RuntimeException(
            s"chaos: injected FATAL fault in partition $pid (attempt $attempt)")
        } else if (pid == target && attempt == 0 &&
            TaskContext.get().attemptNumber() == 0) {
          throw new RuntimeException(
            s"chaos: injected transient fault in partition $pid")
        }
        it
      }
    }
  }

  /** Wrap a DataFrame with fault injection (test harness entry point). */
  def inject(spark: SparkSession, df: DataFrame, runId: String,
             failPartition: Int = 0, fatal: Boolean = false,
             delayMs: Long = 0L): DataFrame =
    org.apache.spark.sql.classic.GraftDatasetShim.ofRows(
      spark, ChaosNode(df.queryExecution.analyzed, runId, failPartition,
        fatal, delayMs))
}
