package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** SURVEY §5.2.3 — ScalaCheck-generated properties over the engine's
  * expression building blocks, evaluated through Spark itself (not a
  * reimplementation) so codegen paths are what's being tested.
  * (The scalatest-scalacheck bridge isn't in the offline cache, so
  * generators are sampled with deterministic seeds instead of forAll.) */
class PropertiesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Deterministic forAll substitute: n seeded samples from gen. */
  private def forSamples[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val vocab = Gen.oneOf("key", "agg", "row", "scan", "slow", "fast", "table", "value")
  private val doc = Gen.listOfN(12, vocab).map(_.mkString(" "))

  private def jaccard(pairs: Seq[(String, String)]) = {
    val j = size(array_intersect(col("ta"), col("tb"))).cast("double") /
      size(array_union(col("ta"), col("tb")))
    pairs.toDF("a", "b")
      .select(array_distinct(split(col("a"), " ")).as("ta"),
              array_distinct(split(col("b"), " ")).as("tb"))
      .select(round(j, 6).as("j")).collect().map(_.getDouble(0)).toSeq
  }

  test("jaccard is bounded in [0,1], symmetric, and 1 on identical docs") {
    forSamples(Gen.listOfN(5, Gen.zip(doc, doc)), 5) { ps =>
      val fwd = jaccard(ps)
      val bwd = jaccard(ps.map(_.swap))
      assert(fwd.forall(x => x >= 0.0 && x <= 1.0))
      assert(fwd === bwd)
      assert(jaccard(ps.map(p => (p._1, p._1))).forall(_ === 1.0))
    }
  }

  test("dedup is idempotent: f(f(x)) == f(x)") {
    forSamples(Gen.listOfN(30, Gen.choose(0L, 9L)), 5) { ids =>
      val once = ids.toDF("id").dropDuplicates("id")
      assert(once.count() === once.dropDuplicates("id").count())
      assert(once.count() === ids.distinct.size.toLong)
    }
  }

  test("union-all counts are additive") {
    forSamples(Gen.zip(Gen.listOf(Gen.choose(0, 100)), Gen.listOf(Gen.choose(0, 100))), 5) {
      case (xs, ys) =>
        assert(xs.toDF("v").unionAll(ys.toDF("v")).count() === (xs.size + ys.size).toLong)
    }
  }

  test("sessionization is invariant under event_id relabeling") {
    forSamples(Gen.listOfN(20, Gen.choose(0L, 3600L * 6)), 3) { offsets =>
      def sessions(ids: Seq[Long]) = {
        val rows = offsets.zip(ids).map { case (off, id) =>
          (id, new java.sql.Timestamp(1704067200000L + off * 1000), 1L, "view", 1.0)
        }
        val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        df.createOrReplaceTempView("prop_events")
        // same gaps-and-islands shape as Streaming.streamSession
        spark.sql(
          """SELECT count(*) AS n FROM (
            |  SELECT sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) OVER
            |    (PARTITION BY user_id ORDER BY ts, event_id) AS sid, user_id
            |  FROM (SELECT *, unix_timestamp(ts) - lag(unix_timestamp(ts)) OVER
            |          (PARTITION BY user_id ORDER BY ts, event_id) AS gap
            |        FROM prop_events) g) s
            |GROUP BY user_id, sid""".stripMargin).count()
      }
      val base = sessions(offsets.indices.map(_.toLong))
      val relabeled = sessions(offsets.indices.map(i => (1000L + i).toLong))
      assert(base === relabeled)
    }
  }
}
