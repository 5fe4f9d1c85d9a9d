package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Algebraic-law property tests over generated data (SURVEY.md §5.3).
  * Small generated DataFrames, laws that must hold for ANY input —
  * the oracle tests pin exact values; these pin the algebra.
  * (scalatestplus is not in the offline cache, so forAll is a small
  * deterministic driver over raw scalacheck Gens.) */
class PropertySpec extends SparkTestBase {

  /** Deterministic forAll: n samples from a fixed seed. */
  private def forAll[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit = {
    var s = Seed(42L)
    (0 until n).foreach { _ =>
      body(gen.pureApply(Gen.Parameters.default, s))
      s = s.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(body.tupled)

  private val rows = Gen.listOfN(40,
    Gen.zip(Gen.choose(0L, 20L), Gen.choose(-100, 100)))

  test("filter fusion: filter(p).filter(q) == filter(p && q)") {
    forAll(rows) { xs =>
      import spark.implicits._
      val df = xs.toDF("k", "v")
      val p = col("v") > 0; val q = col("k") % 2 === 0
      assert(df.filter(p).filter(q).count() == df.filter(p && q).count())
    }
  }

  test("set algebra: |A ∩ B| + |A except B| == |A distinct|") {
    forAll(rows, rows) { (as, bs) =>
      import spark.implicits._
      val a = as.toDF("k", "v"); val b = bs.toDF("k", "v")
      val lhs = a.intersect(b).count() + a.except(b).count()
      assert(lhs == a.distinct().count())
    }
  }

  test("union-all preserves cardinality; union-distinct bounded") {
    forAll(rows, rows) { (as, bs) =>
      import spark.implicits._
      val a = as.toDF("k", "v"); val b = bs.toDF("k", "v")
      assert(a.union(b).count() == a.count() + b.count())
      val ud = a.union(b).distinct().count()
      assert(ud <= a.distinct().count() + b.distinct().count())
      assert(ud >= math.max(a.distinct().count(), b.distinct().count()))
    }
  }

  test("semi/anti partition: semi(A,B) + anti(A,B) == A") {
    forAll(rows, rows) { (as, bs) =>
      import spark.implicits._
      val a = as.toDF("k", "v"); val b = bs.toDF("k", "v").withColumnRenamed("k", "bk")
      val semi = a.join(b, col("k") === col("bk"), "left_semi").count()
      val anti = a.join(b, col("k") === col("bk"), "left_anti").count()
      assert(semi + anti == a.count())
    }
  }

  test("group-by sum equals total sum regardless of grouping") {
    forAll(rows) { xs =>
      import spark.implicits._
      val df = xs.toDF("k", "v")
      val total = df.agg(sum(col("v").cast("long"))).collect()(0)
      val grouped = df.groupBy("k").agg(sum(col("v").cast("long")).as("s"))
        .agg(sum("s")).collect()(0)
      assert((total.isNullAt(0) && grouped.isNullAt(0)) ||
        total.getLong(0) == grouped.getLong(0))
    }
  }

  test("as-of invariant on generated event streams") {
    val evGen = Gen.listOfN(30, Gen.zip(
      Gen.choose(1L, 5L), Gen.choose(0L, 1000L), Gen.oneOf("click", "purchase")))
    forAll(evGen) { evs =>
      import spark.implicits._
      val df = evs.zipWithIndex.map { case ((u, t, ty), i) =>
        (i.toLong, new java.sql.Timestamp(t * 1000), u, ty)
      }.toDF("event_id", "ts", "user_id", "event_type")
      // reuse the production as-of composition on this tiny frame
      val clicks = df.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("tag"), col("event_id"),
          col("ts").as("click_ts"))
      val purchases = df.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("tag"), col("event_id"),
          lit(null).cast("timestamp").as("click_ts"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "tag", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val res = clicks.unionByName(purchases)
        .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
      // invariant: matched click is at-or-before the purchase
      assert(res.filter(col("last_click_ts") > col("ts")).count() == 0)
      // completeness: a purchase with ANY prior click must match one
      val bad = res.filter(col("last_click_ts").isNull).collect().filter { r =>
        val uid = r.getLong(0); val ts = r.getTimestamp(1)
        evs.exists { case (u, t, ty) =>
          ty == "click" && u == uid && t * 1000 <= ts.getTime }
      }
      assert(bad.isEmpty, s"unmatched purchases with prior clicks: ${bad.length}")
    }
  }
}
