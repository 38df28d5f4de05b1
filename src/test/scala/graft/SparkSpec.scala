package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session; ScalaTest
  * runs suites sequentially in the forked JVM). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** Every node of an EXECUTED adaptive plan, recursing through
    * AdaptiveSparkPlanExec/QueryStageExec wrappers — what the
    * broadcast-pin plan-shape assertions inspect, since AQE hides
    * finalized stages behind wrapper nodes. Collect AFTER an action on
    * the DataFrame itself so the adaptive plan is final. */
  def executedNodes(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val nested = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        executedNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        executedNodes(q.plan)
      case _ => Seq.empty
    }
    (p +: p.children.flatMap(executedNodes)) ++ nested
  }
}

object SparkSpec {
  lazy val session: SparkSession = Sessions.local(cores = 4, appName = "graft-test")
}
