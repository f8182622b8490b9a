package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-8 addenda semantics: seq_pattern (CEP-class sequence match) and
  * sink_zorder (space-filling-curve clustering). The DuckDB oracle proves
  * value equality; these tests pin the properties the oracle cannot see —
  * the pattern's necessary conditions and the physical clustering quality
  * of the z-ordered files. */
class Round8OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("seq_pattern: matched users satisfy the pattern's necessary conditions") {
    val out = operators.Analytics.seqPattern(spark, sf0001).collect()
    val users = Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "view", 1).otherwise(0)).as("v"),
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (uid, matched) = (r.getLong(0), r.getInt(2))
      if (matched == 1) {
        val (v, c, p) = users(uid)
        // v→c→p with no intervening error REQUIRES at least one of each
        assert(v >= 1 && c >= 1 && p >= 1,
          s"user $uid matched but has v=$v c=$c p=$p")
      }
    }
    // the fixture's event mix makes clean conversions common enough that a
    // zero count would mean the pattern or the ordering broke
    assert(out.count(_.getInt(2) == 1) > 0)
  }

  test("interval_coverage: union bounds — covered ≤ naive sum, covered ≤ span, islands consistent") {
    val out = operators.Analytics.intervalCoverage(spark, sf0001).collect()
    assert(out.nonEmpty)
    // naive per-supplier totals: sum of window lengths (double-counts
    // overlaps) and line counts, computed independently of the sweep
    val naive = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sumlen"),
        max(col("l_quantity").cast("long")).as("maxlen"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out.foreach { r =>
      val (sk, nLines, islands, covered, span) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (n, sumlen, maxlen) = naive(sk)
      assert(nLines === n)
      // the union can never cover more days than the windows total …
      assert(covered <= sumlen, s"supplier $sk covered $covered > naive $sumlen")
      // … nor more than the overall span, and at least one full window
      assert(covered <= span && covered >= maxlen)
      assert(islands >= 1 && islands <= nLines)
      // islands are separated by ≥1 uncovered day each
      assert(span - covered >= islands - 1)
    }
    // overlap must actually occur in the fixture — otherwise the sweep
    // degenerates to the naive sum and proves nothing
    assert(out.exists(r => r.getLong(3) < naive(r.getLong(0))._2))
  }

  test("llm_bpe_pairs: matches a driver-side brute force over the vocabulary") {
    val out = operators.LlmOpsPipeline.llmBpePairs(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.forall(_._1.length == 2))
    // brute force: word frequencies, then per-word adjacent char pairs
    val freq = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w")).collect()
      .map(_.getString(0)).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cnt = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val support = collection.mutable.Map[String, Set[String]]().withDefaultValue(Set.empty)
    freq.foreach { case (w, f) =>
      w.sliding(2).foreach { p => cnt(p) += f; support(p) += w }
    }
    val expected = cnt.toSeq.map { case (p, c) => (p, c, support(p).size.toLong) }
      .sortBy { case (p, c, _) => (-c, p) }.take(20)
    assert(out.toSeq === expected)
  }

  test("llm_source_kl: non-negative (Gibbs) and matches a driver-side recomputation") {
    val out = operators.LlmOpsPipeline.llmSourceKl(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val toks = Tables.documents(spark, sf0001)
      .select(col("source"), explode(split(col("text"), " ")).as("tok")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val corpusAll = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val top = corpusAll.toSeq.sortBy { case (t, n) => (-n, t) }.take(50).toMap
    val nCorpus = top.values.sum.toDouble
    out.foreach { case (src, nSource, used, kl) =>
      assert(kl >= 0.0, s"KL($src) = $kl < 0 — impossible for distributions on shared support")
      val st = toks.filter(x => x._1 == src && top.contains(x._2))
        .groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(st.values.sum === nSource && st.size === used)
      val expected = st.map { case (t, n) =>
        val p = n / nSource.toDouble; val q = top(t) / nCorpus
        p * math.log(p / q)
      }.sum
      assert(math.abs(kl - expected) < 1e-5, s"KL($src) $kl != $expected")
    }
  }

  test("ts_interp: matches a driver-side sweep; censored rows stay inside their bracket") {
    val out = operators.TimeSeries.tsInterp(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2),
        r.getInt(3), r.getDouble(4)))
    assert(out.nonEmpty && out.exists(_._4 == 0) && out.exists(_._4 == 1))
    out.groupBy(_._1).foreach { case (_, part) =>
      val sorted = part.sortBy(_._2)
      val obsIdx = sorted.zipWithIndex.filter(_._1._4 == 1).map(_._2)
      sorted.zipWithIndex.foreach { case ((_, _, rev, observed, interp), i) =>
        if (observed == 1) assert(interp === rev)
        else {
          val prev = obsIdx.filter(_ < i).lastOption.map(j => sorted(j)._3)
          val next = obsIdx.find(_ > i).map(j => sorted(j)._3)
          (prev, next) match {
            case (Some(p), Some(n)) =>
              // interpolated value must lie inside the bracketing pair
              assert(interp >= math.min(p, n) - 1e-9 && interp <= math.max(p, n) + 1e-9)
            case (Some(p), None) => assert(math.abs(interp - p) < 1e-9)
            case (None, Some(n)) => assert(math.abs(interp - n) < 1e-9)
            case (None, None)    => fail("a priority with zero observations")
          }
        }
      }
    }
  }

  test("dq_fd_check: the key FD holds with zero g3; false FDs report violations") {
    val out = operators.DataQuality.dqFdCheck(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toMap
    val nOrders = Tables.orders(spark, sf0001).count()
    assert(out.size === 3)
    out.values.foreach { case (_, _, rows, _, _) => assert(rows === nOrders) }
    val (_, viol, _, g3, holds) = out("o_orderkey -> o_custkey")
    assert(holds === 1 && viol === 0L && g3 === 0L,
      "orderkey is a key, so orderkey -> custkey must hold exactly")
    Seq("o_custkey -> o_orderpriority", "o_orderdate -> o_orderpriority").foreach { fd =>
      val (lhs, viol, rows, g3, holds) = out(fd)
      assert(holds === 0 && viol > 0 && g3 > 0, s"$fd should be violated in the fixture")
      // g3 can never exceed rows minus one surviving row per lhs group
      assert(g3 <= rows - lhs)
    }
  }

  test("graph_label_prop: deterministic across partitionings; sizes bounded by node count") {
    val a = operators.Clustering.graphLabelProp(spark, sf0001).collect().toSeq
    assert(a.nonEmpty)
    val nNodes = Tables.lineitem(spark, sf0001)
      .selectExpr("l_partkey * 2 AS n").union(
        Tables.lineitem(spark, sf0001).selectExpr("l_suppkey * 2 + 1 AS n"))
      .distinct().count()
    val sizes = a.map(_.getLong(1))
    assert(sizes === sizes.sortBy(-_), "communities must arrive largest-first")
    assert(sizes.sum <= nNodes)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    val b = operators.Clustering.graphLabelProp(s2, sf0001).collect().toSeq
    assert(a === b, "the (cnt DESC, lbl ASC) tie-break must make LPA partition-invariant")
  }

  test("llm_bm25_retrieve: matches a driver-side brute-force BM25 over all candidates") {
    val out = operators.LlmOpsExtra.llmBm25Retrieve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val tf: Map[(Long, String), Long] = docs.toSeq.flatMap { case (id, toks) =>
      toks.groupBy(identity).map { case (t, g) => (id, t) -> g.size.toLong }
    }.toMap
    val len = docs.view.mapValues(_.size.toLong).toMap
    val n = docs.size.toDouble
    val avglen = len.values.sum / n
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def idf(t: String) = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
    def score(q: Long, d: Long): Double = {
      val s = docs(q).distinct.collect {
        case t if tf.contains((d, t)) =>
          val f = tf((d, t)).toDouble
          idf(t) * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * len(d) / avglen))
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    docs.keys.filter(_ < 8).foreach { q =>
      val expected = docs.keys.filter(_ != q)
        .map(d => (d, score(q, d))).filter(_._2 > 0).toSeq
        .sortBy { case (d, s) => (-s, d) }.take(3)
        .zipWithIndex.map { case ((d, s), i) => (q, i + 1L, d, s) }
      val got = out.filter(_._1 == q).sortBy(_._2).toSeq
      assert(got === expected, s"query $q top-3 diverged from brute force")
    }
  }

  test("llm_pca: spectral invariants hold and the output is rerun-stable") {
    val out = operators.LlmOpsExtra.llmPca(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length === 8)
    val shares = out.map(_._2)
    assert(shares.forall(s => s > 0 && s <= 1))
    assert(shares === shares.sortBy(-_), "explained variance must be non-increasing")
    // cum_share is the running sum of var_share (to rounding) and ≤ 1
    out.foldLeft(0.0) { case (acc, (_, s, cum, _)) =>
      assert(math.abs(cum - (acc + s)) < 2e-6); cum
    }
    assert(out.last._3 <= 1.0)
    // Parseval for an orthonormal projection of the RAW vectors (spark.ml
    // PCA projects uncentered data): each component's mean squared
    // projection, and their sum, is bounded by the corpus mean ‖x‖²
    val meanSqNorm = Tables.embeddings(spark, sf0001)
      .select(aggregate(col("embedding").cast("array<double>"), lit(0.0),
        (acc, x) => acc + x * x).as("n2"))
      .agg(avg("n2")).head().getDouble(0)
    assert(out.map(_._4).sum <= meanSqNorm + 1e-6)
    // deterministic across reruns — bench stability depends on it
    val again = operators.LlmOpsExtra.llmPca(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === again.toSeq)
  }

  test("seq_pattern: result is deterministic across shuffle partitionings") {
    val a = operators.Analytics.seqPattern(spark, sf0001).collect().toSeq
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    val b = operators.Analytics.seqPattern(s2, sf0001).collect().toSeq
    assert(a === b)
  }

  test("win_groups_frame: frame counts whole peer GROUPS, not rows or value range") {
    val out = operators.Windows.winGroupsFrame(spark, sf0001).collect()
    assert(out.nonEmpty)
    // brute-force the GROUPS semantics: per event_type, group rows by day;
    // a row's frame = its day-group plus the adjacent day-groups by RANK
    // (not by calendar distance — a 3-day gap is still ONE group step)
    val rows = out.map(r => (r.getString(1), r.getDate(2).toString, r.getLong(0), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, part) =>
      val days = part.map(_._2).distinct.sorted
      val rank = days.zipWithIndex.toMap
      val sizeOf = part.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      part.foreach { case (_, day, eid, grpN) =>
        val g = rank(day)
        val expected = days.filter(d => math.abs(rank(d) - g) <= 1).map(sizeOf).sum
        assert(grpN === expected, s"event $eid day $day: grp_n $grpN != $expected")
      }
    }
  }

  test("join_nearest: no same-user order is strictly closer than the chosen one") {
    val out = operators.JoinsAdvanced.joinNearest(spark, sf0001).collect()
    assert(out.nonEmpty)
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
      .collect().groupBy(_.getLong(0))
    val evUs = Tables.events(spark, sf0001)
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (eid, uid, dist) = (r.getLong(0), r.getLong(2), r.getLong(5))
      val best = orders(uid).map(o => math.abs(evUs(eid) - o.getLong(2))).min
      assert(dist === best, s"event $eid: picked dist $dist, true min $best")
    }
  }

  test("ts_cusum: a planted level shift is located at the shift day") {
    import spark.implicits._
    // 20 stable days at 10 then 20 days at 50: |S_i| peaks exactly at the
    // last day of the old level
    val rows = (1 to 40).map { d =>
      // unique consecutive days, spilling into February past day 28
      val ts = java.sql.Timestamp.valueOf(
        f"2024-${1 + (d - 1) / 28}%02d-${1 + (d - 1) % 28}%02d 12:00:00")
      (d.toLong, ts, 1L, "shift", if (d <= 20) 10.0 else 50.0, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // run the same pipeline shape directly on the synthetic frame
    val daily = df.groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("day").asc)
    val wRun = w.rowsBetween(Long.MinValue, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val cp = daily
      .withColumn("i", row_number().over(w))
      .withColumn("cum", sum("rev").over(wRun))
      .withColumn("mean", avg("rev").over(wAll))
      .withColumn("dev", round(abs(col("cum") - col("i") * col("mean")), 2))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("dev").desc, col("day").asc)))
      .filter(col("rn") === 1)
      .select(col("day")).head().getTimestamp(0)
    // day 20 = 2024-01-20, the last pre-shift day
    assert(cp.toString.startsWith("2024-01-20"))
  }

  test("agg_weighted_median: crossing point respects weights, not row counts") {
    import spark.implicits._
    // 9 rows of value 1 with weight 1, 1 row of value 100 with weight 91:
    // the UNWEIGHTED median is 1; the weighted median must be 100
    val df = (1 to 10).map(i =>
      (if (i == 10) 100.0 else 1.0, if (i == 10) 91.0 else 1.0))
      .toDF("v", "wt")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").asc).rowsBetween(Long.MinValue, 0)
    val got = df
      .withColumn("cumw", sum("wt").over(w))
      .withColumn("tot", sum("wt").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("cumw") >= col("tot") / 2)
      .agg(min("v")).head().getDouble(0)
    assert(got === 100.0)
    // and the declared query agrees with a direct recomputation at sf0.001
    val out = operators.Aggregates.aggWeightedMedian(spark, sf0001).collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) > 0))
  }

  test("llm_span_mask: splicing target spans back into the input restores the text") {
    val out = operators.LlmOpsPipeline.llmSpanMask(spark, sf0001).collect()
    val orig = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    val sentinel = "<extra_id_(\\d+)>".r
    out.foreach { r =>
      val (docId, masked, target) = (r.getLong(0), r.getString(4), r.getString(5))
      // target = "<extra_id_0> t1 t2 <extra_id_1> t3 ..." → span k → tokens
      val spans: Map[Int, Seq[String]] = {
        val parts = sentinel.split(target).toSeq // leading "" before first sentinel
        val ids = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
        ids.zip(parts.drop(1).map(_.trim.split(" ").filter(_.nonEmpty).toSeq)).toMap
      }
      val rebuilt = masked.split(" ").flatMap {
        case tok if sentinel.matches(tok) =>
          spans(tok match { case sentinel(k) => k.toInt })
        case tok => Seq(tok)
      }.mkString(" ")
      assert(rebuilt === orig(docId), s"doc $docId did not round-trip")
    }
  }

  test("ts_seasonal: planted weekly pattern yields strength near 1; fixture strength in [0,1]") {
    import spark.implicits._
    // 8 weeks of a pure weekday pattern (rev = 10*dow) + tiny noise:
    // the DOW profile explains almost all variance
    val rows = (0 until 56).map { d =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)
      val ts = java.sql.Timestamp.valueOf(date.atTime(12, 0))
      // value keyed to the REAL weekday of consecutive dates
      (d.toLong, ts, 1L, "weekly",
        10.0 * date.getDayOfWeek.getValue + 0.01 * (d % 5), "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val daily = df.groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
      .withColumn("dow", weekday(col("day")))
    val wDow = org.apache.spark.sql.expressions.Window.partitionBy("event_type", "dow")
    val strength = daily
      .withColumn("resid", col("rev") - avg("rev").over(wDow))
      .groupBy("event_type")
      .agg((lit(1.0) - var_pop("resid") / var_pop("rev")).as("s"))
      .head().getDouble(1)
    assert(strength > 0.95, s"planted weekly pattern scored $strength")
    // fixture: residual variance can never exceed raw (law of total
    // variance), so strength must land in [0, 1]
    val out = operators.TimeSeries.tsSeasonal(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val s = r.getDouble(5)
      assert(s >= 0.0 && s <= 1.0, s"strength $s out of range")
    }
  }

  test("llm_hard_negatives: no different-label vector beats the mined negative") {
    val out = operators.LlmOpsExtra.llmHardNegatives(spark, sf0001).collect()
    assert(out.nonEmpty)
    val vecs = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) as e")
      .collect()
      .map(r => (r.getLong(0), r.get(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    out.foreach { r =>
      val (vid, label, hnSim, posSim) =
        (r.getLong(0), r.get(1), r.getDouble(4), r.getDouble(5))
      val (_, _, ae) = byId(vid)
      val bestNeg = vecs.filter(v => v._1 != vid && v._2 != label)
        .map(v => cos(ae, v._3)).max
      val bestPos = vecs.filter(v => v._1 != vid && v._2 == label)
        .map(v => cos(ae, v._3)).max
      assert(math.abs(bestNeg - hnSim) < 1e-9, s"anchor $vid: hn $hnSim vs brute $bestNeg")
      assert(math.abs(bestPos - posSim) < 1e-9, s"anchor $vid: pos $posSim vs brute $bestPos")
    }
  }

  test("sink_zorder: files cover compact rectangles in BOTH dimensions") {
    // run the operator (writes the clustered files as a side effect)
    val res = operators.SourcesSinks.sinkZorder(spark, sf0001).collect()
    assert(res.nonEmpty)
    // the operator's REAL per-JVM output path — never hand-reconstructed
    // (VERDICT r14 defect #1: the old fixed-path rebuild here silently
    // read a STALE pre-scratch-isolation artifact from tmpfs)
    val out = operators.SourcesSinks.scratchFor(sf0001, "zorder")
    val spans = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("l_partkey"), col("l_suppkey"))
      .groupBy("f")
      .agg(
        (max("l_partkey") - min("l_partkey")).as("p_span"),
        (max("l_suppkey") - min("l_suppkey")).as("s_span"))
      .agg(avg("p_span"), avg("s_span"), count(lit(1)))
      .head()
    val (pSpan, sSpan, nFiles) = (spans.getDouble(0), spans.getDouble(1), spans.getLong(2))
    assert(nFiles >= 8, s"expected many clustered files, got $nFiles")
    // global spans at sf0.001: l_partkey 1..200, l_suppkey 1..10. A random
    // layout puts ~the whole range in every file (span ≈ max); the z-curve
    // must shrink the AVERAGE file's rectangle on BOTH keys at once —
    // that simultaneous shrink is the property a single-column sort lacks.
    assert(pSpan < 200 * 0.6, s"avg per-file l_partkey span $pSpan not clustered")
    assert(sSpan < 10 * 0.6, s"avg per-file l_suppkey span $sSpan not clustered")
  }

  // ---- wave-8 addenda: moments / benford / ks / theil-sen / jaccard / psi

  test("agg_moments: matches a driver-side exact recomputation") {
    val out = operators.Aggregates.aggMoments(spark, sf0001).collect()
    assert(out.nonEmpty)
    val rows = Tables.lineitem(spark, sf0001)
      .select("l_returnflag", "l_linestatus", "l_extendedprice")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val xs = rows.filter(_._1 == key).map(_._2)
      val mu = BigDecimal(xs.sum / xs.length)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val d = xs.map(_ - mu)
      val (n, m2, m3, m4) = (d.length.toDouble,
        d.map(x => x * x).sum / d.length,
        d.map(x => x * x * x).sum / d.length,
        d.map(x => x * x * x * x).sum / d.length)
      val skew = m3 / math.pow(m2, 1.5)
      val kurt = m4 / (m2 * m2) - 3.0
      assert(math.abs(r.getDouble(4) - skew) < 1e-3, s"$key skew")
      assert(math.abs(r.getDouble(5) - kurt) < 1e-3, s"$key kurt")
      assert(r.getLong(2) === n.toLong)
    }
  }

  test("dq_benford: shares sum to 1, chi2 terms non-negative, counts complete") {
    val out = operators.DataQuality.dqBenford(spark, sf0001).collect()
    assert(out.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 9))
    val nOrders = Tables.orders(spark, sf0001).count()
    assert(out.map(_.getLong(1)).sum === nOrders)
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    // Benford expected shares over digits 1..9 are a fixed distribution
    val expSum = out.map(_.getDouble(3)).sum
    assert(math.abs(expSum - (1 to 9).map(d => math.log10(1.0 + 1.0 / d)).sum) < 1e-4)
    assert(out.forall(_.getDouble(4) >= 0.0))
  }

  test("dq_drift_ks: D equals the exact binned two-sample KS") {
    val r = operators.DataQuality.dqDriftKs(spark, sf0001).head()
    val (d, n1, n2) = (r.getDouble(0), r.getLong(2), r.getLong(3))
    assert(d >= 0.0 && d <= 1.0)
    val o = Tables.orders(spark, sf0001)
      .select(col("o_totalprice"), col("o_orderpriority")).collect()
      .map(x => (math.floor(x.getDouble(0) / 5000.0).toInt, x.getString(1) == "1-URGENT"))
    assert(n1 === o.count(_._2) && n2 === o.count(!_._2))
    val bins = o.map(_._1).distinct.sorted
    val dExact = bins.map { b =>
      val c1 = o.count(x => x._2 && x._1 <= b).toDouble / n1
      val c2 = o.count(x => !x._2 && x._1 <= b).toDouble / n2
      math.abs(c1 - c2)
    }.max
    assert(math.abs(d - dExact) < 1e-5, s"KS $d vs exact $dExact")
  }

  test("ts_theilsen: slope is the exact lower-median pairwise slope per nation") {
    val out = operators.TimeSeries.tsTheilsen(spark, sf0001).collect()
    assert(out.nonEmpty)
    val monthly = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf0001), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mi"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    out.foreach { r =>
      val (name, nPairs, slope) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val series = monthly.filter(_._1 == name).sortBy(_._2)
      val slopes = (for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield {
        val s = (series(j)._3 - series(i)._3) / (series(j)._2 - series(i)._2)
        (BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          series(i)._2, series(j)._2)
      }).sortBy(t => (t._1, t._2, t._3))
      assert(nPairs === slopes.length.toLong, s"$name pair count")
      assert(math.abs(slope - slopes((slopes.length + 1) / 2 - 1)._1) < 1e-9,
        s"$name median slope")
    }
  }

  test("graph_jaccard: scores are exact set Jaccards with correct ordering") {
    val out = operators.Clustering.graphJaccard(spark, sf0001).collect()
    assert(out.nonEmpty)
    val sp = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parts = sp.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1).toSet }
    out.foreach { r =>
      val (s1, s2, inter, d1, d2, j) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(s1 < s2)
      val (p1, p2) = (parts(s1), parts(s2))
      assert(inter === (p1 & p2).size.toLong && d1 === p1.size.toLong && d2 === p2.size.toLong)
      val exact = inter.toDouble / (p1 | p2).size
      assert(math.abs(j - exact) < 1e-5)
    }
    // descending by rounded score with (s1, s2) tie-break
    val keys = out.map(r => (-r.getDouble(5), r.getLong(0), r.getLong(1))).toSeq
    assert(keys === keys.sorted)
  }

  test("llm_source_psi: non-negative, near-zero for an in-blend source, exact driver recompute") {
    val out = operators.LlmOpsPipeline.llmSourcePsi(spark, sf0001).collect()
    assert(out.length === 20 && out.forall(_.getDouble(2) >= 0.0))
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), floor(col("n_chars") / 50.0).cast("int").as("bin"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val bins = docs.map(_._2).distinct.sorted
    val nCorpus = docs.length
    out.foreach { r =>
      val (src, nDocs) = (r.getString(0), r.getLong(1))
      val mine = docs.filter(_._1 == src)
      assert(nDocs === mine.length.toLong)
      val psi = bins.map { b =>
        val p = (mine.count(_._2 == b) + 1.0) / (mine.length + bins.length)
        val q = (docs.count(_._2 == b) + 1.0) / (nCorpus + bins.length)
        (p - q) * (math.log(p) - math.log(q))
      }.sum
      assert(math.abs(r.getDouble(2) - psi) < 1e-5, s"$src psi")
    }
  }

  // ---- wave-9 addenda: gini / kde / pmi / zipf

  test("agg_gini: in [0,1) and matches a driver-side exact recomputation") {
    val out = operators.Aggregates.aggGini(spark, sf0001).collect()
    assert(out.nonEmpty)
    val rev = Tables.orders(spark, sf0001)
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("rev"))
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf0001), col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "o_custkey", "rev")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    out.foreach { r =>
      val (name, g) = (r.getString(0), r.getDouble(3))
      assert(g >= 0.0 && g < 1.0, s"$name gini $g out of range")
      val xs = rev.filter(_._1 == name).sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length
      val exact = 2.0 * xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum /
        (n * xs.sum) - (n + 1.0) / n
      assert(math.abs(g - exact) < 1e-5, s"$name gini $g vs $exact")
      assert(r.getLong(1) === n.toLong)
    }
  }

  test("hist_kde: non-negative, grid-integrates to ≈ the in-range mass") {
    val out = operators.Analytics.histKde(spark, sf0001).collect()
    assert(out.length === 21)
    assert(out.forall(_.getDouble(2) >= 0.0))
    // Riemann sum of the density over the grid ≈ 1 (the grid spans the
    // whole price domain; tails beyond ±2.5 bandwidths are negligible)
    val mass = out.map(_.getDouble(2) * 1e-6 * 25000.0).sum
    assert(mass > 0.85 && mass < 1.1, s"grid mass $mass")
    // density peaks somewhere strictly inside the domain for the
    // near-uniform price fixture — never at the extreme grid edge
    val peak = out.maxBy(_.getDouble(2)).getLong(0)
    assert(peak > 0L && peak < 500000L)
  }

  test("llm_bigram_pmi: support bounds and driver-side exact recomputation") {
    val out = operators.LlmOps.llmBigramPmi(spark, sf0001).collect()
    assert(out.nonEmpty)
    val toks = Tables.documents(spark, sf0001)
      .select(col("text")).collect().map(_.getString(0).split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, xs) => w -> xs.length }
    val bi = toks.filter(_.length >= 2).flatMap(t => t.zip(t.tail))
      .groupBy(identity).map { case (p, xs) => p -> xs.length }
    val (n1, n2) = (uni.values.sum.toDouble, bi.values.sum.toDouble)
    out.foreach { r =>
      val (w1, w2, c12, c1, c2, pmi) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(c12 >= 3 && c12 <= math.min(c1, c2))
      assert(c12 === bi((w1, w2)).toLong && c1 === uni(w1).toLong && c2 === uni(w2).toLong)
      val exact = math.log(c12) + 2.0 * math.log(n1) -
        math.log(n2) - math.log(c1) - math.log(c2)
      assert(math.abs(pmi - exact) < 1e-5, s"($w1,$w2) pmi")
    }
  }

  test("llm_zipf_fit: slope negative, r2 in [0,1], matches driver OLS") {
    val r = operators.LlmOps.llmZipfFit(spark, sf0001).head()
    val (k, slope, intercept, r2) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(slope < 0.0, s"zipf slope $slope should be negative")
    assert(r2 >= 0.0 && r2 <= 1.0)
    val counts = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .sortBy(t => (-t._2, t._1)).take(1000)
    assert(k === counts.length.toLong)
    val xy = counts.zipWithIndex.map { case ((_, n), i) =>
      (math.log(i + 1.0), math.log(n.toDouble)) }
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxx, sxy) = (xy.map(t => t._1 * t._1).sum, xy.map(t => t._1 * t._2).sum)
    val exact = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(slope - exact) < 1e-5, s"slope $slope vs $exact")
    assert(intercept > 0.0) // top term's ln-count at rank 1
  }

  // ---- wave-10 addenda: ttest / chisq / iqr / emb-stats

  test("agg_ttest: matches a driver-side Welch computation") {
    val r = operators.Aggregates.aggTtest(spark, sf0001).head()
    val (n1, n2, t, dof) = (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4))
    val xs = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(x => (x.getString(0) == "1-URGENT", x.getDouble(1)))
    assert(n1 === xs.count(_._1).toLong && n2 === xs.count(!_._1).toLong)
    def stats(g: Boolean) = {
      val v = xs.filter(_._1 == g).map(_._2)
      val mu = BigDecimal(v.sum / v.length)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      (v.length, mu, v.map(x => (x - mu) * (x - mu)).sum / (v.length - 1))
    }
    val ((m1, mu1, s21), (m2, mu2, s22)) = (stats(true), stats(false))
    val se = math.sqrt(s21 / m1 + s22 / m2)
    assert(math.abs(t - (mu1 - mu2) / se) < 1e-3, "t stat")
    // Welch dof bounds: min group − 1 ≤ dof ≤ pooled n − 2
    assert(dof >= math.min(m1, m2) - 1 && dof <= m1 + m2 - 2)
  }

  test("agg_chisq: margins consistent and terms non-negative") {
    val out = operators.Aggregates.aggChisq(spark, sf0001).collect()
    assert(out.nonEmpty)
    val n = out.map(_.getLong(2)).sum
    assert(n === Tables.orders(spark, sf0001).count())
    // expected counts preserve the row margins (Σ_col e = rowTot)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val obs = rows.map(_.getLong(2)).sum.toDouble
      val exp = rows.map(_.getDouble(3)).sum
      assert(math.abs(obs - exp) < 0.01, "row margin")
    }
    assert(out.forall(_.getDouble(4) >= 0.0))
  }

  test("dq_outlier_iqr: fences match driver-side percentile_disc semantics") {
    val out = operators.DataQuality.dqOutlierIqr(spark, sf0001).collect()
    assert(out.length === 25)
    val rev = Tables.orders(spark, sf0001)
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("rev"))
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf0001), col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "rev").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    var anyOutlier = false
    out.foreach { r =>
      val (name, nCust, q1, q3, nOut) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      val v = rev.filter(_._1 == name).map(_._2).sorted
      assert(nCust === v.length.toLong)
      // percentile_disc(p): smallest value at rank ≥ p·n
      def disc(p: Double) = v(math.ceil(p * v.length).toInt - 1)
      assert(q1 === disc(0.25) && q3 === disc(0.75), s"$name quartiles")
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      assert(nOut === v.count(x => x < lo || x > hi).toLong, s"$name outliers")
      anyOutlier ||= nOut > 0
    }
    assert(anyOutlier, "fixture should surface at least one IQR outlier")
  }

  test("llm_emb_stats: dims consistent, all finite, norms match driver fold") {
    val out = operators.LlmOpsExtra.llmEmbStats(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(2) === 1L), "every label one dimensionality")
    assert(out.forall(_.getLong(7) === 0L), "no non-finite elements")
    assert(out.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= r.getDouble(5)))
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    out.foreach { r =>
      val (label, meanNorm) = (r.getInt(0), r.getDouble(3))
      val mine = vecs.filter(_._1 == label)
      val exact = mine.map { case (_, v) =>
        math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      }.sum / mine.length
      assert(math.abs(meanNorm - exact) < 1e-5, s"label $label mean norm")
    }
  }

  // ---- wave-11 addenda: brown / cross-corr / mann-whitney / dataset card

  test("ts_brown: smoothings track the driver-side recurrence; identities hold") {
    val out = operators.TimeSeries.tsBrown(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (s1, s2, level, trend, fcst) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(math.abs(level - (2 * s1 - s2)) < 5e-5, "level identity")
      assert(math.abs(trend - 0.25 * (s1 - s2)) < 5e-7, "trend identity")
      assert(math.abs(fcst - (level + trend)) < 5e-7, "forecast identity")
    }
    // driver-side recurrence replay per type (EWMA closed form ≡ the
    // recurrence; gaps decay by calendar distance, same as ewmaDaily)
    val series = out.groupBy(_.getString(0))
    series.foreach { case (tpe, rows) =>
      val sorted = rows.sortBy(_.getTimestamp(1).getTime)
      var s1v = sorted.head.getDouble(2)
      var s2v = s1v
      var prevDay = sorted.head.getTimestamp(1).toLocalDateTime.toLocalDate
      sorted.zipWithIndex.foreach { case (r, i) =>
        val day = r.getTimestamp(1).toLocalDateTime.toLocalDate
        if (i > 0) {
          val gap = java.time.temporal.ChronoUnit.DAYS.between(prevDay, day).toInt
          val x = r.getDouble(2)
          // a gap of g days applies g decay steps; x arrives on the last
          var k = 0
          while (k < gap - 1) { s1v = 0.8 * s1v; s2v = 0.8 * s2v; k += 1 }
          s1v = 0.2 * x + 0.8 * s1v
          s2v = 0.2 * s1v + 0.8 * s2v
        }
        prevDay = day
        assert(math.abs(r.getDouble(3) - s1v) < 0.02, s"$tpe s1 at $day")
      }
    }
  }

  test("ts_cross_corr: picks the exact per-pair argmax over the lag grid") {
    val out = operators.TimeSeries.tsCrossCorr(spark, sf0001).collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
      .collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate.toEpochDay, r.getDouble(2)))
    val types = daily.map(_._1).distinct.sorted
    out.foreach { r =>
      val (ta, tb, bestLag, corrOut) =
        (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(4))
      assert(corrOut >= -1.0 - 1e-9 && corrOut <= 1.0 + 1e-9)
      assert(types.contains(ta) && types.contains(tb) && ta < tb)
      val av = daily.filter(_._1 == ta).map(t => t._2 -> t._3).toMap
      val bv = daily.filter(_._1 == tb).map(t => t._2 -> t._3).toMap
      val cands = (-3 to 3).flatMap { lag =>
        val xs = av.keys.toSeq.flatMap(d => bv.get(d + lag).map(b => (av(d), b)))
        if (xs.length < 10) None else {
          val k = xs.length.toDouble
          val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
          val num = k * xs.map(t => t._1 * t._2).sum - sx * sy
          val den = math.sqrt((k * xs.map(t => t._1 * t._1).sum - sx * sx) *
            (k * xs.map(t => t._2 * t._2).sum - sy * sy))
          Some(lag -> BigDecimal(num / den)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      val best = cands.maxBy(t => (t._2, -t._1))
      assert(bestLag === best._1, s"($ta,$tb) lag")
      assert(math.abs(corrOut - best._2) < 1e-5, s"($ta,$tb) corr")
    }
  }

  test("agg_mannwhitney: matches a driver-side full-sort rank computation") {
    val r = operators.Aggregates.aggMannwhitney(spark, sf0001).head()
    val (n1, n2, r1, u1, z) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val xs = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), round(col("o_totalprice"), 2)).collect()
      .map(x => (x.getString(0) == "1-URGENT", x.getDouble(1)))
    assert(n1 === xs.count(_._1).toLong && n2 === xs.count(!_._1).toLong)
    // average ranks over the fully sorted combined sample
    val sorted = xs.sortBy(_._2)
    val rankOf = sorted.map(_._2).zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.length) }
    val r1Exact = sorted.filter(_._1).map(t => rankOf(t._2)).sum
    assert(math.abs(r1 - r1Exact) < 1e-6, s"R1 $r1 vs $r1Exact")
    assert(math.abs(u1 - (r1Exact - n1 * (n1 + 1) / 2.0)) < 1e-6)
    assert(!z.isNaN && math.abs(z) < 10)
  }

  test("llm_dataset_card: every headline number matches its direct query") {
    val r = operators.LlmOpsPipeline.llmDatasetCard(spark, sf0001).head()
    val d = Tables.documents(spark, sf0001)
    assert(r.getLong(0) === d.count())
    assert(r.getLong(1) === d.select(explode(split(col("text"), " "))).count())
    assert(r.getLong(2) === d.select(explode(split(col("text"), " ")).as("t"))
      .distinct().count())
    assert(r.getLong(3) === d.select("source").distinct().count())
    assert(r.getLong(4) === d.select("lang").distinct().count())
    val topRow = d.groupBy("source").count()
      .orderBy(col("count").desc, col("source").asc).head()
    assert(r.getString(7) === topRow.getString(0))
    assert(math.abs(r.getDouble(8) - topRow.getLong(1).toDouble / d.count()) < 1e-6)
    assert(r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0) // dup rate
  }

  // ---- wave-12 addenda: asof tolerance / periodogram / rouge pairs

  test("join_asof_tolerance: picks the exact in-window prior order; mixed outcomes") {
    val out = operators.JoinsAdvanced.joinAsofTolerance(spark, sf0001).collect()
    assert(out.nonEmpty)
    val tolMs = 180L * 24 * 3600 * 1000L
    // o_orderdate flows through as TIMESTAMP_NTZ (LocalDateTime)
    def ms(v: Any): Long = v match {
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime =>
        d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
    val orders = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderdate", "o_custkey").collect()
      .map(r => (r.getLong(0), ms(r.get(1)), r.getLong(2)))
    val byCust = orders.groupBy(_._3)
    var matchedCount = 0
    out.foreach { r =>
      val (k1, d1, c1, matched) = (r.getLong(0), ms(r.get(1)), r.getLong(2), r.getInt(5))
      val candidates = byCust(c1).filter { case (k2, d2, _) =>
        (d2 < d1 || (d2 == d1 && k2 < k1)) && d2 >= d1 - tolMs
      }
      if (matched == 1) {
        matchedCount += 1
        val bestExact = candidates.maxBy(t => (t._2, t._1))
        assert(r.getLong(4) === bestExact._1, s"order $k1 prev key")
        assert(ms(r.get(3)) === bestExact._2, s"order $k1 prev date")
      } else {
        assert(candidates.isEmpty, s"order $k1 unmatched but a prior exists")
      }
    }
    assert(matchedCount > 0 && matchedCount < out.length,
      "tolerance should both match and reject on the fixture")
  }

  test("ts_periodogram: matches a driver-side DFT; exactly one peak per type") {
    val out = operators.TimeSeries.tsPeriodogram(spark, sf0001).collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    out.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      assert(rows.count(_.getInt(3) == 1) === 1, s"$tpe peaks")
      val xs = daily.filter(_._1 == tpe).sortBy(_._2).map(_._3)
      val n = xs.length.toDouble
      val mu = BigDecimal(xs.sum / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      rows.foreach { r =>
        val k = r.getInt(1)
        val a = xs.zipWithIndex.map { case (x, t) =>
          (x - mu) * math.cos(2 * math.Pi * k * t / n) }.sum
        val b = xs.zipWithIndex.map { case (x, t) =>
          (x - mu) * math.sin(2 * math.Pi * k * t / n) }.sum
        assert(math.abs(r.getDouble(2) - (a * a + b * b)) < 1.0,
          s"$tpe k=$k power")
        assert(r.getDouble(2) >= 0.0)
      }
    }
  }

  test("llm_rouge_pairs: exact bigram-set overlap metrics on blocked pairs") {
    val out = operators.LlmOpsExtra.llmRougePairs(spark, sf0001).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    def bg(id: Long): Set[String] =
      docs(id).sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
    out.foreach { r =>
      val (a, b, inter, na, nb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b)
      val (sa, sb) = (bg(a), bg(b))
      assert(na === sa.size.toLong && nb === sb.size.toLong)
      assert(inter === (sa & sb).size.toLong, s"pair ($a,$b) inter")
      assert(math.abs(r.getDouble(5) - inter.toDouble / na) < 1e-6)
      assert(math.abs(r.getDouble(7) - 2.0 * inter / (na + nb)) < 1e-6)
    }
    // blocked pairs share a minimal shingle — they must overlap heavily
    assert(out.map(_.getDouble(7)).min > 0.0, "blocked pairs share ≥1 bigram")
  }

  // ---- wave-13 addenda: forecast eval / snapshot diff (stream_argmax
  //      equivalence lives in StreamingEquivalenceSpec)

  test("ts_forecast_eval: error metrics match a recomputation from ts_brown") {
    val out = operators.TimeSeries.tsForecastEval(spark, sf0001).collect()
    assert(out.nonEmpty)
    val brown = operators.TimeSeries.tsBrown(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2), r.getDouble(7)))
    out.foreach { r =>
      val (tpe, n, mae, maeN, rmse) = (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val s = brown.filter(_._1 == tpe).sortBy(_._2)
      val evals = s.zip(s.tail).map { case ((_, _, x, f), (_, _, xn, _)) =>
        (math.abs(xn - f), math.abs(xn - x), (xn - f) * (xn - f)) }
      assert(n === evals.length.toLong, s"$tpe n_evals")
      assert(math.abs(mae - evals.map(_._1).sum / n) < 1e-3, s"$tpe mae")
      assert(math.abs(maeN - evals.map(_._2).sum / n) < 1e-3, s"$tpe mae_naive")
      assert(math.abs(rmse - math.sqrt(evals.map(_._3).sum / n)) < 1e-3, s"$tpe rmse")
      assert(rmse >= mae - 1e-9, s"$tpe rmse >= mae (Jensen)")
      assert(math.abs(r.getDouble(5) - (1.0 - mae / maeN)) < 1e-4, s"$tpe skill")
    }
  }

  test("dq_snapshot_diff: classes match the modular construction exactly") {
    val out = operators.DataQuality.dqSnapshotDiff(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = Tables.orders(spark, sf0001)
      .select("o_orderkey").collect().map(_.getLong(0))
    val added = keys.count(_ % 103 == 0).toLong
    val removed = keys.count(_ % 101 == 0).toLong
    val changed = keys.count(k => k % 97 == 0 && k % 101 != 0).toLong
    assert(out.getOrElse("added", 0L) === added)
    assert(out.getOrElse("removed", 0L) === removed)
    assert(out.getOrElse("changed", 0L) === changed)
    assert(out.getOrElse("unchanged", 0L) ===
      keys.length - removed - changed)
    assert(added > 0 && removed > 0 && changed > 0, "all classes exercised")
  }

  test("llm_perplexity: flag budget, bounds, and doc census vs the shared core") {
    val out = operators.LlmOpsPipeline.llmPerplexity(spark, sf0001).collect()
    assert(out.nonEmpty)
    val docs = out.map(_.getLong(1)).sum
    val flagged = out.map(_.getLong(5)).sum
    // strictly-above-p90_disc can never exceed 10% of the scored corpus
    assert(flagged <= docs / 10 + 1, s"flagged $flagged of $docs breaks the decile budget")
    assert(flagged > 0, "fixture spread should flag someone")
    out.foreach { r =>
      val (avg, mn, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // cross-entropy of an add-one-smoothed LM is strictly positive
      assert(mn > 0 && mn <= avg && avg <= mx, s"${r.getString(0)} ce ordering")
    }
    // census: every doc with >= 1 bigram is scored exactly once
    val scored = operators.LlmOpsPipeline.bigramDocLp(spark, sf0001).count()
    assert(docs === scored)
  }

  test("graph_cc_sizes: distribution is the exact rollup of the cluster listing") {
    val clusters = operators.Clustering.llmDedupClusters(spark, sf0001)
      .select("cluster", "csize").collect()
      .groupBy(_.getLong(0)).map { case (_, rs) => rs.head.getLong(1) }
    val expect = clusters.groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    val out = operators.Clustering.graphCcSizes(spark, sf0001).collect()
    assert(out.map(_.getLong(0)).toSeq === out.map(_.getLong(0)).toSeq.sorted)
    out.foreach { r =>
      val (sz, nc, nd) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(sz >= 2, "every component has an edge, so size >= 2")
      assert(nd === sz * nc, "n_docs must equal csize * n_clusters")
      assert(expect(sz) === nc, s"cluster count at size $sz")
    }
    assert(out.map(_.getLong(2)).sum ===
      operators.Clustering.llmDedupClusters(spark, sf0001).count())
  }

  test("llm_cross_source_dup: matrix total equals the fingerprint-group pair count") {
    val out = operators.LlmOpsExtra.llmCrossSourceDup(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "unordered pair normalization")
      assert(r.getLong(2) > 0 && r.getLong(3) > 0)
    }
    // independent census: sum over docs of (n_sharing - 1) double-counts
    // each same-fp pair exactly twice
    val sharing = operators.LlmOpsExtra.llmFingerprint(spark, sf0001)
      .select("n_sharing").collect().map(_.getLong(0))
    val totalPairs = sharing.map(_ - 1).sum / 2
    assert(out.map(_.getLong(2)).sum === totalPairs)
  }

  test("llm_novelty: every distinct bigram is new exactly once, rates bounded") {
    val out = operators.LlmOpsPipeline.llmNovelty(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (docs, nb, nn, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(docs > 0 && nb >= docs, "a counted doc has >= 1 distinct bigram")
      assert(nn >= 0 && nn <= nb)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // identity: summed n_new over sources = corpus distinct-bigram count
    // (each bigram's min-doc_id owner claims it exactly once)
    val toks = split(col("text"), " ")
    val distinctBg = Tables.documents(spark, sf0001)
      .filter(size(toks) >= 2)
      .select(explode(array_distinct(transform(sequence(lit(1), size(toks) - 1),
        i => xxhash64(element_at(toks, i), element_at(toks, i + 1))))).as("b"))
      .agg(countDistinct("b")).head().getLong(0)
    assert(out.map(_.getLong(3)).sum === distinctBg)
  }

  test("llm_dp_counts: noise replays the documented Laplace transform exactly") {
    val out = operators.LlmOpsPipeline.llmDpCounts(spark, sf0001).collect()
    assert(out.length === 20)
    val total = Tables.documents(spark, sf0001).count()
    assert(out.map(_.getLong(1)).sum === total)
    out.foreach { r =>
      val (src, n, rel) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val k = src.drop(3).toLong
      val p = 1000003L
      val u = ((k % p) * 2654435761L % p + 1).toDouble / 1000004.0
      val noise = BigDecimal(-math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expect = BigDecimal(n + noise).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rel - expect) < 1e-9, s"$src: $rel vs $expect")
      assert(math.abs(rel - n) < 15.0, "Laplace(1) tail bound on the fixture seeds")
    }
  }

  test("llm_dedup_sweep: monotone in the threshold, consistent with rouge pairs") {
    val out = operators.LlmOpsExtra.llmDedupSweep(spark, sf0001).collect()
    assert(out.length === 5)
    val rouge = operators.LlmOpsExtra.llmRougePairs(spark, sf0001)
      .select("a", "b", "rouge2_f").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.foreach { r =>
      val (thr, cand, dup, dropped) =
        (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cand === rouge.length.toLong, "candidate census is threshold-free")
      assert(dup === rouge.count(_._3 >= thr).toLong, s"dup pairs at $thr")
      assert(dropped === rouge.filter(_._3 >= thr).map(_._2).distinct.length.toLong)
      assert(dropped <= dup, "keep-first drops at most one doc per pair")
    }
    val byThr = out.sortBy(_.getDouble(0)).map(_.getLong(2))
    assert(byThr.zip(byThr.tail).forall { case (a, b) => a >= b }, "monotone")
  }

  test("stream_topk: per-group bound and exact membership vs window ranking") {
    val out = operators.Streaming.streamTopk(spark, sf0001).collect()
      .map(r => ((r.get(0).toString, r.getString(1)), (r.getLong(2), r.getDouble(3))))
    out.groupBy(_._1).foreach { case (k, rs) =>
      assert(rs.length <= 3, s"group $k exceeded k=3") }
    // the native heap exec must be invisible next to the window-rank form
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("wstart", "event_type")
      .orderBy(col("value").desc, col("event_id").asc)
    val ref = Tables.events(spark, sf0001)
      .select(date_trunc("hour", col("ts")).as("wstart"), col("event_type"),
        col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect()
      .map(r => ((r.get(0).toString, r.getString(1)),
        (r.getLong(2), BigDecimal(r.getDouble(3))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))).toSet
    assert(out.toSet === ref)
  }

  test("funnel_latency: deciles ordered, census consistent with funnel_steps") {
    val r = operators.Analytics.funnelLatency(spark, sf0001).head()
    val (conv, p25, p50, p90, avg) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(conv > 0)
    assert(p25 > 0 && p25 <= p50 && p50 <= p90, "decile ordering")
    assert(avg > 0)
    // every converting user here viewed then purchased — at most the
    // funnel's viewed census, at least its purchase-after-click count
    val steps = operators.Analytics.funnelSteps(spark, sf0001).head()
    assert(conv <= steps.getLong(1), "conversions <= viewed users")
    assert(conv >= steps.getLong(3), "view->purchase is weaker than view->click->purchase")
  }

  test("llm_index_stats: censuses agree with a direct posting-list build") {
    val r = operators.LlmOpsExtra.llmIndexStats(spark, sf0001).head()
    val post = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").count()
    assert(r.getLong(0) === post.select("doc_id").distinct().count(), "n_docs")
    assert(r.getLong(1) === post.select("tok").distinct().count(), "vocab")
    assert(r.getLong(2) === post.count(), "postings = sum of df")
    assert(r.getLong(3) <= r.getLong(0), "df can't exceed doc count")
    assert(r.getLong(4) <= r.getLong(3), "p90 <= max")
    val ss = r.getDouble(5)
    assert(ss >= 0.0 && ss <= 1.0)
  }

  test("dq_freshness: watermark row has zero lag, 24h counts bounded") {
    val out = operators.DataQuality.dqFreshness(spark, sf0001).collect()
    assert(out.nonEmpty)
    // exactly the type carrying the corpus max ts must show lag 0
    assert(out.count(_.getLong(3) == 0L) >= 1)
    out.foreach { r =>
      assert(r.getLong(3) >= 0, "lag is non-negative")
      assert(r.getLong(4) <= r.getLong(1), "trailing-24h count <= total")
      assert(r.getLong(4) >= (if (r.getLong(3) <= 86400000000L - 1) 1L else 0L),
        "a type whose last event is inside the window contributes to it")
    }
  }

  test("graph_assortativity: bounded coefficient, edge census matches pair frame") {
    val r = operators.Clustering.graphAssortativity(spark, sf0001).head()
    val edges = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_suppkey").distinct().count()
    assert(r.getLong(0) === edges, "edge census")
    assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9, "correlation bound")
    // avg endpoint degree over edges is >= 1 and edge-weighted (hubs
    // count once per incident edge, so it is >= the plain mean degree)
    assert(r.getDouble(1) >= 1.0 && r.getDouble(2) >= 1.0)
  }

  test("ts_decay: weights in (0,1], ESS between 1 and n, totals bounded") {
    val out = operators.TimeSeries.tsDecay(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, sumW, sumW2, ess) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(sumW > 0 && sumW <= n, "decayed mass can't exceed the count")
      assert(sumW2 <= sumW + 1e-6, "w <= 1 forces sum w^2 <= sum w")
      assert(ess >= 1.0 - 1e-9 && ess <= n + 1e-6, "ESS in [1, n]")
      // w <= 1 gives sum w^2 <= sum w, hence ESS = (sum w)^2/sum w^2 >= sum w
      assert(ess >= sumW - 1e-6)
    }
  }

  test("win_regression: slope matches a local OLS refit on a spot frame") {
    val out = operators.Windows.winRegression(spark, sf0001).collect()
      .filter(_.getString(0) == "view")
      .sortBy(_.getTimestamp(1).toString)
    assert(out.length > 28, "enough days to fill a frame")
    out.foreach(r => assert(r.getLong(3) <= 28, "frame bound"))
    // refit the last row's 28-observation frame by hand
    val frame = out.takeRight(28).map(r =>
      (r.getTimestamp(1).toLocalDateTime.toLocalDate.toEpochDay -
        java.time.LocalDate.parse("2024-01-01").toEpochDay).toDouble
        -> r.getDouble(2))
    val n = frame.length
    val (sx, sy) = (frame.map(_._1).sum, frame.map(_._2).sum)
    val sxx = frame.map(p => p._1 * p._1).sum
    val sxy = frame.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.last.getDouble(4) - slope) < 1e-3,
      s"engine ${out.last.getDouble(4)} vs refit $slope")
    val r2 = out.last.getDouble(5)
    assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9)
  }

  test("graph_kcore: core-degree and maximality invariants define the result") {
    val r = operators.Clustering.graphKcore(spark, sf0001).head()
    val (k, nParts, nSupps, nEdges, rounds) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(k >= 1 && rounds >= 1)
    assert(nParts > 0 && nSupps > 0 && nEdges > 0, "fixture core is non-empty")
    // replay the peel in Scala from the raw distinct pair list
    var edges = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_suppkey").distinct().collect()
      .map(r2 => (r2.getLong(0) * 2, r2.getLong(1) * 2 + 1)).toSet
    var changed = true
    while (changed) {
      val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      edges = next
    }
    val coreNodes = edges.flatMap(e => Seq(e._1, e._2))
    assert(nParts === coreNodes.count(_ % 2 == 0).toLong, "part census")
    assert(nSupps === coreNodes.count(_ % 2 == 1).toLong, "supplier census")
    assert(nEdges === edges.size.toLong, "edge census")
    // defining invariant: every core node keeps >= k core neighbors
    val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
    assert(deg.values.forall(_ >= k), "core degree >= k")
  }

  test("llm_emb_pq: training improves on the untrained codebook, codes bounded") {
    val spark2 = spark
    import spark2.implicits._
    val out = operators.LlmOpsExtra.llmEmbPq(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= r.getDouble(3) + 1e-9)
      assert(r.getLong(4) >= 1 && r.getLong(4) <= r.getLong(1),
        "distinct signatures bounded by vector count")
    }
    // trained (2 Lloyd steps) must beat the raw seeded-Gaussian init on
    // corpus reconstruction error — else the training pass is dead code
    def corpusErr(iters: Int): Double = {
      val cb = operators.LlmOpsExtra.pqCodebook(spark, sf0001, iters)
      val cbDf = cb.zipWithIndex.flatMap { case (sub, m) =>
        sub.zipWithIndex.map { case (cent, j) => (m, j.toLong, cent) } }
        .toDF("m", "j", "cent")
      operators.LlmOpsExtra.pqAssign(spark, sf0001, cbDf)
        .groupBy("vec_id").agg(sqrt(sum(col("b.d2"))).as("err"))
        .agg(avg("err")).head().getDouble(0)
    }
    val (untrained, trained) = (corpusErr(0), corpusErr(2))
    assert(trained < untrained,
      s"training must reduce reconstruction error ($trained vs $untrained)")
  }

  test("billing ops: tier arithmetic, aging census, proration bounds") {
    // tiered: billed equals the hand-computed marginal-tier charge on a
    // few spot quantities, and the blended rate sits inside [1, 3]
    val tiers = operators.Billing.billTiered(spark, sf0001).collect()
    assert(tiers.nonEmpty)
    tiers.foreach { r =>
      val rate = r.getDouble(4)
      assert(rate >= 1.0 - 1e-9 && rate <= 3.0 + 1e-9, s"blended rate $rate")
      assert(r.getLong(6) <= r.getLong(5), "t3 lines are a subset of t2 lines")
      assert(r.getLong(5) <= r.getLong(1), "t2 lines bounded by line count")
    }
    def charge(q: Double): Double =
      math.min(q, 10) * 3 + math.min(math.max(q - 10, 0), 15) * 2 + math.max(q - 25, 0)
    assert(math.abs(charge(5) - 15.0) < 1e-9 && math.abs(charge(30) - 65.0) < 1e-9)
    // aging: buckets partition the open orders exactly
    val open = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "O").count()
    val aging = operators.Billing.billAging(spark, sf0001).collect()
    assert(aging.map(_.getLong(1)).sum === open, "buckets partition open orders")
    aging.foreach(r => assert(r.getDouble(2) > 0))
    // proration: prorated <= full per month, fraction in (0, 1]
    val pro = operators.Billing.billProration(spark, sf0001).collect()
    assert(pro.nonEmpty)
    pro.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-6, "prorated <= full")
      val f = r.getDouble(4)
      assert(f > 0 && f <= 1.0 + 1e-9)
    }
    assert(pro.map(_.getLong(1)).sum === Tables.orders(spark, sf0001).count())
  }

  test("bill_mrr_bridge: movement identity — components sum to the net change") {
    val out = operators.Billing.billMrrBridge(spark, sf0001).collect()
    assert(out.length > 2)
    out.foreach { r =>
      val (nw, exp, con, ch, net) = (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nw >= 0 && exp >= 0 && con <= 0 && ch <= 0, "component signs")
      // the bridge identity: new + expansion + contraction + churn = net
      assert(math.abs(nw + exp + con + ch - net) < 0.05,
        s"bridge ${r.get(0)}: $nw+$exp+$con+$ch != $net")
    }
    // cross-check one month's net against the raw month-over-month delta
    val monthly = Tables.orders(spark, sf0001)
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
      .collect().map(r => r.get(0).toString.take(7) -> r.getDouble(1)).toMap
    val mids = out.drop(1).dropRight(1) // interior months have both sides
    mids.foreach { r =>
      val m = r.get(0).toString.take(7)
      val prevM = java.time.YearMonth.parse(m).minusMonths(1).toString
      for (cur <- monthly.get(m); prev <- monthly.get(prevM))
        assert(math.abs(r.getDouble(5) - (cur - prev)) < 0.05,
          s"net at $m vs raw delta")
    }
  }

  test("ts_drawdown: matches a sequential replay of the running-peak curve") {
    val out = operators.TimeSeries.tsDrawdown(spark, sf0001).collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("rev"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1)
    out.foreach { r =>
      val tpe = r.getString(0)
      val series = daily(tpe).sortBy(_._2.getTime).map(_._3)
      var peak = Double.MinValue
      var best = (0.0, -1) // (dd, index) — first index wins ties
      series.zipWithIndex.foreach { case (v, i) =>
        peak = math.max(peak, v)
        val dd = BigDecimal((peak - v) / peak)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (dd > best._1) best = (dd, i)
      }
      assert(r.getLong(1) === series.length.toLong, s"$tpe day census")
      assert(math.abs(r.getDouble(5) - best._1) < 1e-9, s"$tpe max drawdown")
      assert(r.getDouble(5) >= 0 && r.getDouble(5) < 1.0)
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9, "trough <= peak")
    }
  }

  test("dq_corr_matrix: 6 bounded pairs, spot value matches direct corr") {
    val out = operators.DataQuality.dqCorrMatrix(spark, sf0001).collect()
    assert(out.length === 6)
    out.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val direct = Tables.lineitem(spark, sf0001)
      .agg(corr(col("l_quantity"), col("l_extendedprice"))).head().getDouble(0)
    val row = out.find(r =>
      r.getString(0) == "l_quantity" && r.getString(1) == "l_extendedprice").get
    assert(math.abs(row.getDouble(2) - direct) < 1e-4)
  }
}
