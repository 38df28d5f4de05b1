package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splits for training pipelines.
  *
  * Train/val/test assignment must be (a) stable across runs, engines,
  * and partitionings — the same doc lands in the same split forever, or
  * eval sets leak into training; (b) driver-free and shuffle-free. A
  * seeded `randomSplit` fails (a): it is partitioning-dependent. Keyed
  * hashing gives both: the split is a pure projection of the id.
  *
  * Mechanism: the first 8 hex chars of md5(id) are a uniform 32-bit
  * value; cumulative fraction thresholds become hex-string constants and
  * assignment is a string comparison — one codegen'd CASE, no UDF, and
  * byte-identical in any engine with md5 (lowercase-hex comparison IS
  * numeric comparison here). */
object Splits {

  /** Append a `split` column assigning each row to the first label whose
    * cumulative fraction bound covers its hashed id. Fractions must sum
    * to <= 1; any remainder falls to `defaultLabel`. */
  def byHash(df: DataFrame, idCol: String,
             fractions: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1),
             defaultLabel: String = "test"): DataFrame =
    df.withColumn("split", splitExpr(col(idCol), fractions, defaultLabel))

  /** The assignment expression itself, for use inside larger plans. */
  def splitExpr(id: Column, fractions: Seq[(String, Double)],
                defaultLabel: String): Column = {
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val h = substring(md5(id.cast("string")), 1, 8)
    val cums = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val cases = fractions.zip(cums).map { case ((label, _), cum) =>
      (label, thresholdHex(cum))
    }
    cases.foldRight(lit(defaultLabel): Column) { case ((label, th), els) =>
      when(h < lit(th), lit(label)).otherwise(els)
    }
  }

  /** Cumulative fraction -> 8-char lowercase hex bound on [0, 2^32). */
  def thresholdHex(cum: Double): String =
    f"${math.min((cum * 4294967296.0).toLong, 0xFFFFFFFFL)}%08x"
}
