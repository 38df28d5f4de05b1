package graft

import org.apache.spark.sql.functions._

/** Stage-level profile of `text_tfidf` (run with
  * `Test/runMain graft.TfidfProbe <sfDir>`): the r17 #2 sf10 query
  * (54.9 s, 12.7x per data decade) has never been decomposed — where
  * does the wall go: the tokenize+explode scan, the (doc, term) tf
  * aggregate, the df-from-tf aggregate, the term join, or the per-doc
  * top-k window? Also A/Bs the two candidate fixes the r17 verdict
  * names: a merge-pinned vocabulary side vs AQE's choice on the term
  * join, and whether the rank filter prunes inside the window
  * (WindowGroupLimit) in the executed plan. */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = Sessions.local(appName = "graft-tfidf-probe")
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def timeIt(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime
      f.write.format("noop").mode("overwrite").save()
      println(f"TFIDFPROBE $tag ${(System.nanoTime - t) / 1e9}%.1f s")
    }
    // stage 1: tokenize + explode (scan-bound)
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.wordTokens(col("text"))).as("term"))
    timeIt("explode")(toks)
    // stage 2: + (doc, term) tf aggregate (first shuffle)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    timeIt("tf_aggregate")(tf)
    // stage 3: + df from tf (second shuffle, term-keyed)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    timeIt("df_aggregate")(dfreq)
    // stage 4: + term join + idf arithmetic (third shuffle or broadcast)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(
        col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
    timeIt("term_join")(scored)
    // stage 5: the full query (adds the per-doc top-k window)
    timeIt("full_tfidf")(graft.operators.TextAnalysis.tfidf(docs))
    timeIt("full_tfidf2")(graft.operators.TextAnalysis.tfidf(docs))
    // A/B: pin the term join to sort-merge (is AQE picking badly?)
    val scoredPinned = tf.join(dfreq.hint("merge"), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(
        col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
    timeIt("term_join_mergepinned")(scoredPinned)
    // A/B: broadcast the vocabulary side outright
    val scoredBcast = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(
        col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
    timeIt("term_join_broadcast")(scoredBcast)
    // plan check: does the executed plan carry a WindowGroupLimit?
    val full = graft.operators.TextAnalysis.tfidf(docs)
    full.write.format("noop").mode("overwrite").save()
    val plan = full.queryExecution.executedPlan.toString
    println("TFIDFPROBE window_group_limit=" +
      plan.contains("WindowGroupLimit"))
    println("TFIDFPROBE vocab_rows=" + dfreq.count())
    println("TFIDFPROBE tf_rows=" + tf.count())
    // isolate the top-k stage on a MATERIALIZED scored table: window
    // (shuffle on doc_id + sort + rank) vs aggregate top-k
    // (collect_list + array_sort + slice + explode — same shuffle
    // volume, no partition-wide sort)
    val mat = scored.localCheckpoint()
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    timeIt("window_only")(mat.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10))
    timeIt("window_only2")(mat.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10))
    val agg = mat.groupBy("doc_id").agg(
      slice(array_sort(collect_list(struct(
        (-col("tfidf")).as("neg"), col("term"), col("tf"), col("df"),
        col("tfidf")))), 1, 10).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("doc_id"), col("t.term"), col("t.tf"), col("t.df"),
        col("t.tfidf"), (col("i") + 1).cast("long").as("rk"))
    timeIt("agg_topk_only")(agg)
    timeIt("agg_topk_only2")(agg)
    // ---- why is full ~36 s over its join prefix when the window alone
    // costs ~2 s? A/B the composition suspects.
    // (a) AQE partition coalescing off
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    timeIt("full_nocoalesce")(graft.operators.TextAnalysis.tfidf(docs))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // (b) WindowGroupLimit off (does the partial rank pass cost more
    // than it saves on a 40-term vocabulary?)
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
    timeIt("full_nogrouplimit")(graft.operators.TextAnalysis.tfidf(docs))
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
    // (c) full pipeline with the window replaced by aggregate top-k
    val aggFull = scored.groupBy("doc_id").agg(
      slice(array_sort(collect_list(struct(
        (-col("tfidf")).as("neg"), col("term"), col("tf"), col("df"),
        col("tfidf")))), 1, 10).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("doc_id"), col("t.term"), col("t.tf"), col("t.df"),
        col("t.tfidf"), (col("i") + 1).cast("long").as("rk"))
    timeIt("full_aggtopk")(aggFull)
    timeIt("full_aggtopk2")(aggFull)
    // ---- single-scan candidates (the executed plan shows the corpus
    // tokenized + shuffled TWICE: the dfreq branch is column-pruned
    // into a distinct, so it is NOT a reused exchange)
    // variant A: materialize tf once, df from the checkpoint
    def variantA() = {
      val tfm = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dfr = tfm.groupBy("term").agg(count(lit(1)).as("df"))
      val sc = tfm.join(dfr, "term").crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(
          col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      val w2 = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term").asc)
      sc.withColumn("rk", row_number().over(w2)).where(col("rk") <= 10)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("tfidf"), col("rk").cast("long").as("rk"))
    }
    timeIt("variantA_checkpoint")(variantA())
    timeIt("variantA_checkpoint2")(variantA())
    // variant B: df as a count window over the term partition — one
    // corpus pass, no materialization, no join
    def variantB() = {
      val tf2 = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val wTerm = Window.partitionBy("term")
      val sc = tf2.withColumn("df", count(lit(1)).over(wTerm))
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(
          col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      val w2 = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("term").asc)
      sc.withColumn("rk", row_number().over(w2)).where(col("rk") <= 10)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("tfidf"), col("rk").cast("long").as("rk"))
    }
    timeIt("variantB_dfwindow")(variantB())
    timeIt("variantB_dfwindow2")(variantB())
    spark.stop()
  }
}
