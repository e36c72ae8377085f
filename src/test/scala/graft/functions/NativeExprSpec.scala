package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** The native minhash expression must be bit-identical to the composed
  * higher-order-function form (which is itself oracle-gated against DuckDB
  * via q_dedup_minhash_sig) — including codegen and interpreted eval paths.
  */
class NativeExprSpec extends AnyFunSuite with SparkFixture {
  private val MinhashP = 2147483647L
  private val K = 16

  private def composedSig = {
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    val shingles = when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array())
    val shash = transform(shingles, sh => GraftFunctions.hash60(sh) % MinhashP)
    aggregate(shash,
      transform(sequence(lit(0), lit(K - 1)), _ => lit(MinhashP)),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(K - 1)),
        (m, k) => least(m, ((k * 2 + 1) * h + k * lit(1000003L)) % MinhashP)))
  }

  test("native graft_minhash_sig equals the composed HOF form") {
    import spark.implicits._
    MinhashSigExpr.register(spark)
    val rng = new scala.util.Random(11)
    val docs = (0 until 300).map { i =>
      val n = rng.nextInt(40)
      (i.toLong, (0 until n).map(_ => rng.alphanumeric.take(1 + rng.nextInt(8)).mkString)
        .mkString(" ") + (if (i % 7 == 0) "  doubled  spaces " else ""))
    } :+ ((300L, "")) :+ ((301L, "one two")) :+ ((302L, "one two three"))
    val df = docs.toDF("doc_id", "text")
    val both = df.select($"doc_id",
      expr("graft_minhash_sig(text)").as("native"), composedSig.as("composed"))
      .collect()
    both.foreach { r =>
      val native = r.get(1)
      val composed = r.getSeq[Long](2)
      val words = r.toString() // unused; keep assertion message simple
      if (native == null) {
        // <3 words: native is NULL; composed returns the all-P init vector
        assert(composed == null || composed.forall(_ == MinhashP), s"doc ${r.get(0)}")
      } else {
        assert(r.getSeq[Long](1) == composed, s"doc ${r.get(0)}")
      }
    }
    // SQL registration path works end-to-end
    df.createOrReplaceTempView("ndocs")
    val viaSql = spark.sql("SELECT count(*) FROM ndocs WHERE graft_minhash_sig(text) IS NOT NULL")
      .head().getLong(0)
    assert(viaSql == docs.count { case (_, t) =>
      t.split(" ").count(_.nonEmpty) >= 3 })
  }

  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val nw = rng.nextInt(30)
      (i.toLong, (0 until nw).map(_ => rng.alphanumeric.take(1 + rng.nextInt(8)).mkString)
        .mkString(" ") + (if (i % 5 == 0) "  doubled  spaces " else ""))
    } :+ ((9000L, "")) :+ ((9001L, "a b c d")) :+ ((9002L, "a b c d e f"))
  }

  test("native graft_simhash equals the composed bit-vote form") {
    import spark.implicits._
    SimhashExpr.register(spark)
    val df = randomDocs(13, 200).toDF("doc_id", "text")
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    val wh = transform(ws, w => GraftFunctions.hash60(w))
    val composed = (0 until 60).map { j =>
      val set = size(filter(wh, h => shiftright(h, j) % 2 === 1))
      when(set * 2 > size(wh), lit(1L) * math.pow(2, j).toLong).otherwise(0L)
    }.reduce(_ + _)
    val rows = df.select(expr("graft_simhash(text)"), composed).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("native graft_fingerprints equals the composed gram-sample form") {
    import spark.implicits._
    FingerprintsExpr.register(spark)
    val df = randomDocs(17, 200).toDF("doc_id", "text")
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    val grams = when(size(ws) >= 5,
      transform(sequence(lit(1), size(ws) - 4),
        i => GraftFunctions.hash60(concat_ws(" ", (0 until 5).map(k => element_at(ws, i + k)): _*))))
      .otherwise(array())
    val composed = filter(grams, h => h % 17 === 0)
    val rows = df.select(expr("graft_fingerprints(text)"), composed).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("native graft_substr_fps equals the composed 8-gram sample form") {
    import spark.implicits._
    SubstrFpsExpr.register(spark)
    val df = randomDocs(23, 200).toDF("doc_id", "text")
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    val g = SubstrFpsExpr.Gram
    val grams = when(size(ws) >= g,
      transform(sequence(lit(1), size(ws) - (g - 1)),
        i => GraftFunctions.hash60(concat_ws(" ", (0 until g).map(k => element_at(ws, i + k)): _*))))
      .otherwise(array())
    val composed = filter(grams, h => h % SubstrFpsExpr.Mod === 0)
    val rows = df.select(expr("graft_substr_fps(text)"), composed).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("native graft_stop_hits equals the composed filter-count forms") {
    import spark.implicits._
    StopHitsExpr.register(spark)
    // random docs salted with real stopwords so every slot gets exercised
    val rng = new scala.util.Random(19)
    val stopPool = (StopHitsExpr.En ++ StopHitsExpr.De ++ StopHitsExpr.Fr ++ StopHitsExpr.Es).toIndexedSeq
    val docs = randomDocs(19, 150).map { case (id, t) =>
      val salt = (0 until rng.nextInt(6)).map(_ => stopPool(rng.nextInt(stopPool.size))).mkString(" ")
      (id, s"$t $salt")
    }
    val df = docs.toDF("doc_id", "text")
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    def hits(stops: Seq[String]) = size(filter(ws, w => w.isInCollection(stops))).cast("long")
    val union = (StopHitsExpr.En ++ StopHitsExpr.De ++ StopHitsExpr.Fr ++ StopHitsExpr.Es).distinct
    val rows = df.select(expr("graft_stop_hits(text)").as("native"),
      array(hits(StopHitsExpr.En), hits(StopHitsExpr.De), hits(StopHitsExpr.Fr),
        hits(StopHitsExpr.Es), hits(union)).as("composed")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("native graft_lsh_bucket / graft_lsh_dots equal the composed HOF forms") {
    import spark.implicits._
    NativeLsh.register(spark)
    // deterministic pseudo-random 64-dim quantized vectors
    val df = spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        i => GraftFunctions.hash60(concat(col("id").cast("string"), lit("#"), i.cast("string")))
          % 2001 - 1000).as("q"))
    for (planes <- Seq(8, 11)) {
      // the composed forms this expression replaced (per-row md5 weights)
      val composedDots = transform(sequence(lit(0), lit(planes - 1)), p =>
        aggregate(
          zip_with(col("q"),
            transform(sequence(lit(1), lit(64)),
              i => GraftFunctions.hash60(concat(p.cast("string"), lit("|"), i.cast("string"))) % 2001 - 1000),
            (x, w) => x * w),
          lit(0L), (acc, v) => acc + v))
      val composedBucket = (0 until planes).map { p =>
        val dot = aggregate(
          zip_with(col("q"),
            transform(sequence(lit(1), lit(64)),
              i => GraftFunctions.hash60(concat(lit(s"$p|"), i.cast("string"))) % 2001 - 1000),
            (x, w) => x * w),
          lit(0L), (acc, v) => acc + v)
        when(dot > 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
      val rows = df.select(
        expr(s"graft_lsh_bucket(q, $planes)"), composedBucket,
        expr(s"graft_lsh_dots(q, $planes)"), composedDots).collect()
      rows.foreach { r =>
        assert(r.getLong(0) == r.getLong(1), s"bucket mismatch at $planes planes: $r")
        assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"dots mismatch at $planes planes: $r")
      }
    }
  }

  test("native graft_ivf_argmax equals the composed argmax-over-codebook form") {
    import spark.implicits._
    NativeIvf.register(spark)
    val df = spark.range(300).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)),
        i => GraftFunctions.hash60(concat(col("id").cast("string"), lit("#"), i.cast("string")))
          % 2001 - 1000).as("q"))
    val cents = df.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
      .agg(sort_array(collect_list(struct(col("cid"), col("cq")))).as("cents"))
    val joined = df.crossJoin(broadcast(cents))
    // the composed HOF form the native expression replaced
    val qdot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    val composed = joined.withColumn("a", array_max(transform(col("cents"),
        c => struct(qdot(col("q"), c("cq")).as("cdot"), (-c("cid")).as("ncid")))))
      .select(col("vec_id"), (-col("a.ncid")).as("cid"))
    val native = joined.select(col("vec_id"), expr("graft_ivf_argmax(q, cents)").as("cid"))
    val c1 = composed.orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val n1 = native.orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(n1.toSeq == c1.toSeq)
    // ties and argmax actually vary across centroids (not all one bucket)
    assert(n1.map(_._2).distinct.length > 4)
  }

  test("native graft_pq_encode / graft_pq_adc equal the composed subspace folds") {
    import spark.implicits._
    NativePq.register(spark)
    val Sub = NativePq.Sub; val Dim = NativePq.Dim
    val df = spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(Sub * Dim)),
        i => GraftFunctions.hash60(concat(col("id").cast("string"), lit("#"), i.cast("string")))
          % 2001 - 1000).as("q"))
    val cb = df.filter(col("vec_id") < NativePq.Codes)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
      .agg(sort_array(collect_list(struct(col("cid"), col("cq")))).as("cb"))
    val joined = df.crossJoin(broadcast(cb))
    // composed encode: per-subspace strict-< fold (tie → first = smaller cid)
    def subsq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
        m: org.apache.spark.sql.Column) =
      aggregate(zip_with(slice(a, m * Dim + 1, lit(Dim)), slice(b, m * Dim + 1, lit(Dim)),
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val composedCodes = transform(sequence(lit(0), lit(Sub - 1)), m =>
      aggregate(col("cb"), struct(lit(Long.MaxValue).as("d"), lit(-1L).as("c")),
        (acc, ent) => {
          val dist = subsq(col("q"), ent("cq"), m)
          when(dist < acc("d"), struct(dist.as("d"), ent("cid").as("c"))).otherwise(acc)
        },
        acc => acc("c")))
    val both = joined.select(col("vec_id"),
      expr("graft_pq_encode(q, cb)").as("ncodes"), composedCodes.as("ccodes"), col("q"), col("cb"))
    both.collect().foreach(r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"encode mismatch at ${r.getLong(0)}"))
    // composed ADC over the native codes (qq = the row's own q, any vector works)
    val adc = both.select(col("vec_id"),
      expr("graft_pq_adc(q, ncodes, cb)").as("nadist"),
      aggregate(sequence(lit(0), lit(Sub - 1)), lit(0L), (acc, m) =>
        acc + subsq(col("q"),
          element_at(col("cb"), (element_at(col("ncodes"), m.cast("int") + 1) + 1).cast("int"))("cq"),
          m)).as("cadist"))
    adc.collect().foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"adc mismatch at ${r.getLong(0)}"))
  }

  test("extension class injects EVERY native function at session build time") {
    // a native registered only via its object's register() but forgotten in
    // GraftExtensions silently vanishes for users who wire the library the
    // standard way (spark.sql.extensions=graft.functions.GraftExtensions) —
    // exactly what happened to the five functions added in rounds 8–10
    val injected = scala.collection.mutable.Set.empty[String]
    val recorder = new org.apache.spark.sql.SparkSessionExtensions {
      override def injectFunction(
          fd: (org.apache.spark.sql.catalyst.FunctionIdentifier,
            org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
            Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
              org.apache.spark.sql.catalyst.expressions.Expression)): Unit = {
        injected += fd._1.funcName
        super.injectFunction(fd)
      }
    }
    new GraftExtensions().apply(recorder)
    val expected = Set(
      "graft_minhash_sig", "graft_simhash", "graft_fingerprints",
      "graft_stop_hits", "graft_lsh_bucket", "graft_lsh_dots",
      "graft_ivf_argmax", "graft_hist_quantile", "graft_hist_quantiles",
      "graft_substr_fps", "graft_gt_census", "graft_vec_residual",
      "graft_pq_encode", "graft_pq_adc")
    assert(expected.subsetOf(injected.toSet),
      s"missing from GraftExtensions: ${(expected -- injected).toSeq.sorted.mkString(", ")}")
  }
}
