package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe for the round-11 hub-collapse A/B: verifies the
  * representative-collapsed forms of llm_minhash / llm_simhash /
  * llm_emb_neardup emit exactly the pair set of the direct quadratic
  * band/block joins (exceptAll both ways), then times both forms. Run on
  * a pristine fixture AND on the StressGen 10× frame — the latter is
  * where duplicate classes matter. Verdict (2026-08-15, recorded in the
  * operator scaladocs + STRESS.md): collapse ships for llm_emb_neardup
  * (kernel-bound candidates, 3.1→0.9 s at 10×), is reverted for
  * llm_minhash / llm_simhash (output-materialization-bound — direct is
  * faster at both scales).
  *
  *   sbt "runMain graft.ProbeHub /root/testdata/sf0.1 2 [--skip-eq|--skip-direct]"
  */
object ProbeHub {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt
    val skipDirect = args.contains("--skip-direct")
    val skipEq = skipDirect || args.contains("--skip-eq")
    val capOnly = args.contains("--cap-only") // round-12 df-cap A/B alone
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val forms: Seq[(String, (SparkSession, String) => DataFrame, (SparkSession, String) => DataFrame)] = Seq(
      ("llm_minhash", operators.LlmOps.llmMinhashCollapsed, operators.LlmOps.llmMinhash),
      ("llm_simhash", operators.LlmOpsExtra.llmSimhashCollapsed, operators.LlmOpsExtra.llmSimhash),
      ("llm_emb_neardup", operators.LlmOpsExtra.llmEmbNeardup, operators.LlmOpsExtra.llmEmbNeardupDirect))

    (if (capOnly) Nil else forms).foreach { case (name, collapsed, direct) =>
      if (!skipEq) {
        val s = collapsed(spark, sfDir); val d = direct(spark, sfDir)
        val onlyS = s.exceptAll(d).count(); val onlyD = d.exceptAll(s).count()
        val n = s.count()
        println(s"EQ $name pairs=$n collapsed_only=$onlyS direct_only=$onlyD " +
          (if (onlyS == 0 && onlyD == 0) "OK" else "MISMATCH"))
      }
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val c = collapsed(spark, sfDir).count()
        val t1 = System.nanoTime()
        if (skipDirect) {
          println(f"TIME $name rep=$r collapsed=${(t1 - t0) / 1e9}%.2f s rows=$c (direct skipped)")
        } else {
          val c2 = direct(spark, sfDir).count()
          val t2 = System.nanoTime()
          println(f"TIME $name rep=$r collapsed=${(t1 - t0) / 1e9}%.2f s direct=${(t2 - t1) / 1e9}%.2f s rows=$c/$c2")
        }
      }
    }

    // round-12 df-cap A/B (VERDICT r11 task 4): the capped form must be
    // a SUBSET of the direct pair set (capped_only == 0 always; on a
    // bucket-width-bounded corpus the sets are equal), and the question
    // is whether truncating hub buckets buys wall-clock where the
    // collapse could not (it attacks candidate GENERATION and the
    // output rows together).
    val capped = (s: SparkSession, d: String) => operators.LlmOps.llmMinhashCapped(s, d)
    if (!skipEq) {
      val cf = capped(spark, sfDir); val df = operators.LlmOps.llmMinhash(spark, sfDir)
      val onlyC = cf.exceptAll(df).count(); val onlyD = df.exceptAll(cf).count()
      println(s"EQ llm_minhash_capped(64) capped_only=$onlyC direct_only=$onlyD " +
        (if (onlyC == 0) "SUBSET-OK" else "VIOLATION") +
        (if (onlyD == 0) " (exact-equal)" else s" (cap dropped $onlyD pairs)"))
    }
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val c = capped(spark, sfDir).count()
      val t1 = System.nanoTime()
      if (skipDirect) {
        println(f"TIME llm_minhash_capped rep=$r capped=${(t1 - t0) / 1e9}%.2f s rows=$c (direct skipped)")
      } else {
        val c2 = operators.LlmOps.llmMinhash(spark, sfDir).count()
        val t2 = System.nanoTime()
        println(f"TIME llm_minhash_capped rep=$r capped=${(t1 - t0) / 1e9}%.2f s direct=${(t2 - t1) / 1e9}%.2f s rows=$c/$c2")
      }
    }
    spark.stop()
  }
}
