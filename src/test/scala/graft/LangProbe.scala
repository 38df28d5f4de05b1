package graft

import org.apache.spark.sql.functions._

/** Stage A/B for `text_langid` (run with `Test/runMain graft.LangProbe
  * <sfDir>`): the current five regexp_extract_all passes vs
  * regexp_count (no match-array materialisation) vs a single-pass
  * typed token counter (the ceiling for a codegen expression). */
object LangProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = Sessions.local(appName = "graft-lang-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def timeIt(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime
      f.write.format("noop").mode("overwrite").save()
      println(f"LANGPROBE $tag ${(System.nanoTime - t) / 1e9}%.1f s")
    }
    timeIt("current")(graft.operators.TextAnalysis.languageId(docs)
      .select("doc_id", "cnt_en", "cnt_de", "cnt_fr", "cnt_es", "cnt_cjk", "lang_pred"))
    // variant B: regexp_count
    val lowered = lower(col("text"))
    val counts = graft.operators.TextAnalysis.langStopwords.map { case (l, pat) =>
      l -> regexp_count(lowered, lit(pat)).cast("long")
    }
    val cjk = regexp_count(col("text"), lit("[\\u4e00-\\u9fff]")).cast("long")
    val b = counts.foldLeft(docs) { case (df, (l, c)) => df.withColumn(s"cnt_$l", c) }
      .withColumn("cnt_cjk", cjk)
      .select("doc_id", "cnt_en", "cnt_de", "cnt_fr", "cnt_es", "cnt_cjk")
    timeIt("regexp_count")(b)
    // variant C: one typed pass, token hash-set lookups (ceiling)
    val sets = graft.operators.TextAnalysis.langStopwords.map { case (_, pat) =>
      pat.stripPrefix("\\b(").stripSuffix(")\\b").split('|').toSet
    }
    val c = docs.select(col("doc_id"), col("text").as[String] match { case _ => col("text") })
    val typed = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val t = if (text == null) "" else text
          var cjkN = 0L
          var i = 0
          while (i < t.length) {
            val ch = t.charAt(i)
            if (ch >= '一' && ch <= '鿿') cjkN += 1
            i += 1
          }
          val low = t.toLowerCase(java.util.Locale.ROOT)
          val cnts = new Array[Long](4)
          var s = 0
          while (s < low.length) {
            val ch = low.charAt(s)
            val isW = (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9') || ch == '_'
            if (isW) {
              var e = s + 1
              while (e < low.length && {
                val c2 = low.charAt(e)
                (c2 >= 'a' && c2 <= 'z') || (c2 >= '0' && c2 <= '9') || c2 == '_'
              }) e += 1
              val tok = low.substring(s, e)
              var k = 0
              while (k < 4) { if (sets(k).contains(tok)) cnts(k) += 1; k += 1 }
              s = e
            } else s += 1
          }
          (id, cnts(0), cnts(1), cnts(2), cnts(3), cjkN)
        }
      }.toDF("doc_id", "cnt_en", "cnt_de", "cnt_fr", "cnt_es", "cnt_cjk")
    timeIt("typed_single_pass")(typed)
    // equivalence check on a sample
    val cur = graft.operators.TextAnalysis.languageId(docs.limit(20000))
      .select("doc_id", "cnt_en", "cnt_de", "cnt_fr", "cnt_es", "cnt_cjk")
    val alt = typed.join(cur.withColumnRenamed("cnt_en", "e2")
      .withColumnRenamed("cnt_de", "d2").withColumnRenamed("cnt_fr", "f2")
      .withColumnRenamed("cnt_es", "s2").withColumnRenamed("cnt_cjk", "c2"), "doc_id")
      .where(col("cnt_en") =!= col("e2") || col("cnt_de") =!= col("d2") ||
        col("cnt_fr") =!= col("f2") || col("cnt_es") =!= col("s2") ||
        col("cnt_cjk") =!= col("c2"))
    println("LANGPROBE mismatches=" + alt.count())
    spark.stop()
  }
}
