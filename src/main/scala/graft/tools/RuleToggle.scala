package graft.tools

import org.apache.spark.sql.SparkSession

/** Save/restore-safe toggling of `spark.sql.optimizer.excludedRules`
  * for the scale probes' naive-vs-rule arms. The probes' old
  * set/unset pattern CLOBBERED any pre-existing exclusions — a probe
  * run inside a session that already excludes rules would silently
  * re-enable them. These helpers keep prior exclusions in both arms
  * and restore the exact prior conf afterwards.
  */
object RuleToggle {
  private val key = "spark.sql.optimizer.excludedRules"

  private def list(v: Option[String]): Seq[String] =
    v.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  private def restore(spark: SparkSession, prior: Option[String]): Unit =
    prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }

  private def put(spark: SparkSession, xs: Seq[String]): Unit =
    if (xs.isEmpty) spark.conf.unset(key)
    else spark.conf.set(key, xs.mkString(","))

  /** Run `body` with `rule` guaranteed EXCLUDED (prior exclusions
    * kept), then restore the prior conf. */
  def withExcluded[T](spark: SparkSession, rule: String)(body: => T): T = {
    val prior = spark.conf.getOption(key)
    put(spark, (list(prior) :+ rule).distinct)
    try body finally restore(spark, prior)
  }

  /** Run `body` with `rule` guaranteed INCLUDED (other prior
    * exclusions kept), then restore the prior conf. */
  def withIncluded[T](spark: SparkSession, rule: String)(body: => T): T = {
    val prior = spark.conf.getOption(key)
    put(spark, list(prior).filterNot(_ == rule))
    try body finally restore(spark, prior)
  }
}
