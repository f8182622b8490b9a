package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{sim, DdSketchState}

/** agg_quantile_union (round 13, VERDICT r12 task 4 / named gap 1):
  * mergeable DDSketch quantile states and their cross-source
  * column-algebra union — the quantile twin of ThetaUnionSpec.
  *
  * Load-bearing claims, in ThetaUnionSpec's order:
  *  - STATE level: the algebraic union (map_zip_with integer addition
  *    over collected per-source states) equals the state one direct
  *    corpus-wide sketch builds — exact map equality, no tolerance,
  *    because bucket counts add exactly;
  *  - the declared query's estimates sit within the α = 1% relative
  *    error bound of their exact percentile_disc audit columns;
  *  - buffer-level merge commutativity;
  *  - partition invariance (bit-equal canonical state);
  *  - the eval-time collapse rule (maxBuckets) folds the LOWEST buckets
  *    and preserves total count;
  *  - SQL usability via the extension registration.
  */
class QuantileUnionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mapOf(r: org.apache.spark.sql.Row, i: Int): Map[Int, Long] =
    r.getMap[Int, Long](i).toMap

  test("union state == direct corpus-wide sketch state (exact map equality)") {
    val docs = Tables.documents(spark, sf001).select("source", "n_chars")
    val emptyMap = map_from_arrays(array().cast("array<int>"), array().cast("array<bigint>"))
    val unioned = docs.groupBy("source")
      .agg(sim.ddsketchState(col("n_chars")).as("state"))
      .agg(aggregate(collect_list(col("state")), emptyMap,
        (acc, m) => map_zip_with(acc, m,
          (_, v1, v2) => coalesce(v1, lit(0L)) + coalesce(v2, lit(0L)))).as("state"))
      .head()
    val direct = docs.agg(sim.ddsketchState(col("n_chars")).as("state")).head()
    assert(mapOf(unioned, 0) === mapOf(direct, 0),
      "DDSketch merge property: bucket counts add exactly, so union == direct")
  }

  test("declared query: every estimate within alpha=1% of its exact audit " +
    "(2% asserted for midpoint slack)") {
    val rows = operators.Aggregates.aggQuantileUnion(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.count(_.getString(0) == "__union__") === 1)
    rows.foreach { r =>
      val estP50 = r.getDouble(1); val exactP50 = r.getDouble(2)
      val estP95 = r.getDouble(3); val exactP95 = r.getDouble(4)
      assert(math.abs(estP50 - exactP50) <= 0.02 * exactP50,
        s"${r.getString(0)}: p50 est=$estP50 exact=$exactP50")
      assert(math.abs(estP95 - exactP95) <= 0.02 * exactP95,
        s"${r.getString(0)}: p95 est=$estP95 exact=$exactP95")
    }
  }

  test("buffer-level merge is commutative and adds counts") {
    val agg = DdSketchState(org.apache.spark.sql.catalyst.expressions.Literal(0.0))
    def buf(entries: (Int, Long)*): java.util.TreeMap[Integer, java.lang.Long] = {
      val b = agg.createAggregationBuffer()
      entries.foreach { case (k, v) => b.put(k, v) }
      b
    }
    val ab = agg.merge(buf(1 -> 3L, 5 -> 2L, 9 -> 1L), buf(1 -> 4L, 7 -> 6L))
    val ba = agg.merge(buf(1 -> 4L, 7 -> 6L), buf(1 -> 3L, 5 -> 2L, 9 -> 1L))
    import scala.jdk.CollectionConverters._
    assert(ab.asScala.toMap === ba.asScala.toMap)
    assert(ab.get(1) === 7L)
    assert(ab.asScala.values.map(_.longValue()).sum === 16L)
  }

  test("partition invariance: repartition(1) vs 32 vs hash → identical state") {
    val df = (0 until 30000).map(i => ((i * 2654435761L) % 9000 + 1).toDouble).toDF("v")
    def state(d: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      mapOf(d.agg(sim.ddsketchState(col("v"))).head(), 0)
    val a = state(df.repartition(1))
    val b = state(df.repartition(32))
    val c = state(df.repartition(7, col("v")))
    assert(a === b)
    assert(b === c)
    assert(a.values.sum === 30000L, "total count preserved")
  }

  test("eval-time collapse: maxBuckets folds lowest buckets, preserves N, " +
    "keeps high quantiles") {
    // values spanning many buckets: 1..10000 → ~460 buckets at alpha=1%
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val full = mapOf(df.agg(sim.ddsketchState(col("v"), 0.01, 2048)).head(), 0)
    val capped = mapOf(df.agg(sim.ddsketchState(col("v"), 0.01, 50)).head(), 0)
    assert(full.size > 50 && capped.size === 50)
    assert(capped.values.sum === full.values.sum, "collapse preserves total count")
    // the kept buckets are the HIGHEST indices; the lowest kept bucket
    // absorbed everything below it
    val keptSorted = capped.keys.toSeq.sorted
    val fullSorted = full.keys.toSeq.sorted
    assert(keptSorted.tail === fullSorted.takeRight(50).tail,
      "all but the fold bucket are the top full buckets unchanged")
    assert(capped(keptSorted.head) >= full(keptSorted.head),
      "fold bucket absorbed the low tail")
  }

  test("500 seeded random datasets: alpha bound holds at every probed " +
    "quantile vs the exact order statistic") {
    // scalar replay of the estimator against exact rank statistics on
    // small random multisets — the EventPatternQuantSpec "independent
    // hand truth" style: bucketing and estimation re-derived here from
    // the paper's formulas, NOT from the aggregate's code
    val alpha = 0.01
    val gamma = (1 + alpha) / (1 - alpha)
    val rnd = new scala.util.Random(1913)
    (1 to 500).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      // mixed magnitudes: uniform, heavy-tailed, and near-integer values
      val xs = Vector.fill(n)(rnd.nextInt(3) match {
        case 0 => rnd.nextDouble() * 1000 + 0.001
        case 1 => math.exp(rnd.nextDouble() * 12) // 1..160k, log-spread
        case _ => (rnd.nextInt(500) + 1).toDouble
      })
      val buckets = xs.groupBy(x => math.ceil(math.log(x) / math.log(gamma)).toInt)
        .view.mapValues(_.size.toLong).toMap
      val sortedXs = xs.sorted
      Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
        val rank = math.max(1, math.ceil(q * n).toInt)
        val exact = sortedXs(rank - 1)
        // walk the sorted buckets to the rank, take the geometric midpoint
        val ordered = buckets.toSeq.sortBy(_._1)
        var cum = 0L; var idx = Option.empty[Int]
        ordered.foreach { case (i, c) =>
          cum += c; if (idx.isEmpty && cum >= rank) idx = Some(i)
        }
        val est = 2.0 * math.pow(gamma, idx.get) / (gamma + 1)
        assert(math.abs(est - exact) <= alpha * exact * 1.0000001,
          s"n=$n q=$q est=$est exact=$exact")
      }
    }
  }

  test("sketch table round-trips through parquet: estimates unchanged") {
    // the 100 TB contract is a sketch TABLE an engine writes once and
    // any consumer re-aggregates later — state must survive the file
    // boundary bit-exactly
    val docs = Tables.documents(spark, sf0001).select("source", "n_chars")
    val states = docs.groupBy("source")
      .agg(sim.ddsketchState(col("n_chars")).as("state"))
    val dir = java.nio.file.Files.createTempDirectory("graft_qsketch_rt_").toString
    states.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val a = states.collect().map(r => r.getString(0) -> mapOf(r, 1)).toMap
    val b = back.collect().map(r => r.getString(0) -> mapOf(r, 1)).toMap
    assert(a === b)
  }

  test("non-positive and null inputs: reserved bucket, nulls skipped") {
    val df = Seq(Some(-3.0), Some(0.0), None, Some(2.0)).toDF("v")
    val st = mapOf(df.agg(sim.ddsketchState(col("v"))).head(), 0)
    assert(st(Int.MinValue) === 2L, "negative and zero land in the reserved bucket")
    assert(st.values.sum === 3L, "null skipped")
  }

  test("collapse never folds the reserved non-positive bucket into a " +
    "positive one") {
    // negatives plus enough positive spread to force a collapse: the
    // reserved bucket must survive with its exact count, the fold
    // happening among positive buckets only (round-13 review: folding
    // it would read zeros/negatives back as positive estimates)
    val df = ((1 to 10000).map(_.toDouble) ++ Seq.fill(7)(-1.0)).toDF("v")
    val st = mapOf(df.agg(sim.ddsketchState(col("v"), 0.01, 50)).head(), 0)
    assert(st.size === 50)
    assert(st(Int.MinValue) === 7L, "reserved bucket intact through collapse")
    assert(st.values.sum === 10007L)
  }

  test("bucket index saturation never collides with the reserved bucket") {
    // At a legal tiny alpha, invLogGamma is huge and a subnormal positive
    // value's bucket index falls below Int range; double→int SATURATES to
    // Int.MinValue — the reserved non-positive bucket. Before the round-13
    // clamp, that classified a positive value as "zero/negative": here the
    // positive subnormal and the genuine negative must land in DIFFERENT
    // buckets, with the positive one at the Int.MinValue+1 floor.
    val df = Seq(java.lang.Double.MIN_VALUE, -1.0).toDF("v")
    val st = mapOf(df.agg(sim.ddsketchState(col("v"), 1e-9, 2048)).head(), 0)
    assert(st(Int.MinValue) === 1L, "only the negative in the reserved bucket")
    assert(st(Int.MinValue + 1) === 1L, "positive subnormal clamped to the floor bucket")
  }

  test("usable from SQL via extension registration; literal args honored") {
    Tables.registerAll(spark, sf0001)
    val st = spark.sql("SELECT ddsketch_state(n_chars) FROM documents").head()
      .getMap[Int, Long](0)
    val n = spark.sql("SELECT count(n_chars) FROM documents").head().getLong(0)
    assert(st.values.map(identity[Long]).sum === n,
      "bucket counts sum to the non-null row count")
    // a coarser alpha via SQL literal produces FEWER buckets — the arg
    // is honored, not silently dropped (round-13 review)
    val coarse = spark.sql("SELECT ddsketch_state(n_chars, 0.1) FROM documents")
      .head().getMap[Int, Long](0)
    assert(coarse.size < st.size,
      s"alpha=0.1 (${coarse.size} buckets) must be coarser than 0.01 (${st.size})")
  }
}
