package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSpec {

  test("native hash60 expression == builtin-only chain, on real text and edge cases") {
    val s = spark; import s.implicits._
    val samples = Seq("abc", "", " ", "the quick brown fox", "üñïçødé", "0", "a" * 500)
      .toDF("t")
    val diff = samples
      .withColumn("a", GraftFunctions.hash60(col("t")))
      .withColumn("b", GraftFunctions.hash60Portable(col("t")))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
    // and over a real table slice
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val diff2 = docs
      .withColumn("a", GraftFunctions.hash60(col("text")))
      .withColumn("b", GraftFunctions.hash60Portable(col("text")))
      .filter(col("a") =!= col("b"))
    assert(diff2.count() == 0)
  }

  test("PercentUpperExpr / IdnHostExpr: interpreted eval == codegen'd plan path") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val pctIn = Seq("a%2fb", "a%2Fb", "%ff%FF%fF", "100%", "%zz", "%a", "", "%",
      "x%3a/y%0d", "no escapes at all").toDF("t")
    val idnIn = Seq("münchen.example.com/p/q", "xn--mnchen-3ya.example.com",
      "plain.example.com/x", "bücher.de", "münchen.de:8080/x", "").toDF("t")
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    def both(df: org.apache.spark.sql.DataFrame,
             mkCol: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
             mkExpr: Expression => Expression): Unit = {
      // plan path runs through whole-stage codegen (doGenCode); the
      // interpreted path calls nullSafeEval directly on the same inputs
      val planned = df.select(col("t"), mkCol(col("t")).as("o"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      df.collect().map(_.getString(0)).foreach { v =>
        val interp = mkExpr(Literal.create(v)).eval(null).toString
        assert(planned(v) == interp, s"codegen/interpreted diverge on '$v'")
      }
    }
    both(pctIn,
      c => ColumnBridge.column(graft.functions.PercentUpperExpr(ColumnBridge.expression(c))),
      e => graft.functions.PercentUpperExpr(e))
    both(idnIn,
      c => ColumnBridge.column(graft.functions.IdnHostExpr(ColumnBridge.expression(c))),
      e => graft.functions.IdnHostExpr(e))
    // spot values: the documented semantics
    val got = spark.range(1).select(
      ColumnBridge.column(graft.functions.PercentUpperExpr(
        ColumnBridge.expression(lit("a%2fb%zz%a")))).as("p"),
      ColumnBridge.column(graft.functions.IdnHostExpr(
        ColumnBridge.expression(lit("münchen.example.com/a%2f")))).as("i")).head()
    assert(got.getString(0) == "a%2Fb%zz%a")
    assert(got.getString(1) == java.net.IDN.toASCII("münchen.example.com") + "/a%2f")
  }

  test("hash60 is registered for SQL via GraftExtensions") {
    val got = spark.sql("SELECT hash60('abc') AS h").head().getLong(0)
    val expected = spark.range(1).select(
      GraftFunctions.hash60Portable(lit("abc")).as("h")).head().getLong(0)
    assert(got == expected)
  }

  test("time conversions reproduce the reference's exact values (test_time_convert.py)") {
    val s = spark; import s.implicits._
    import graft.functions.GraftFunctions._
    val row = Seq(1749822139000L).toDF("ms").select(
      epochMillisToTs(col("ms")).as("ts"),
      esriDatetime(epochMillisToTs(col("ms"))).as("esri"),
      brisbaneIso(epochMillisToTs(col("ms"))).as("bne")).head()
    // milliseconds_to_iso_8601_utc: 1749822139000 == 2025-06-13T13:42:19Z
    assert(row.getTimestamp(0).toInstant == java.time.Instant.parse("2025-06-13T13:42:19Z"))
    // datetime_to_esri_datetime_utc round-trip formats the UTC instant
    assert(row.getString(1) == "2025-06-13 13:42:19")
    // utc_to_brisbane_time: +10:00, no DST in Queensland
    assert(row.getString(2) == "2025-06-13T23:42:19+1000")
  }

  test("vec_dot / vec_dist2 are registered for SQL via GraftExtensions") {
    val dot = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot == 9.0)
    val d2 = spark.sql(
      "SELECT vec_dist2(array(CAST(1.0 AS DOUBLE)), array(CAST(4.0 AS DOUBLE))) AS d")
      .head().getDouble(0)
    assert(d2 == 9.0)
  }

  test("native DotExpr/Dist2Expr == HOF twins bit-for-bit, incl. null/length edge cases") {
    val s = spark; import s.implicits._
    import graft.functions.VectorOps
    // real float embeddings from the fixture + hand-built edge cases
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(64)
    val self = emb.select(col("embedding").as("a"), col("embedding").as("b"))
    val pairs = emb.select(col("embedding").as("a"))
      .crossJoin(emb.select(col("embedding").as("b")).limit(4))
    for (df <- Seq(self, pairs)) {
      val rows = df.select(
        VectorOps.dot(col("a"), col("b")).as("n_dot"),
        VectorOps.dotHof(col("a"), col("b")).as("h_dot"),
        VectorOps.dist2(col("a"), col("b")).as("n_d2"),
        VectorOps.dist2Hof(col("a"), col("b")).as("h_d2")).collect()
      assert(rows.nonEmpty)
      // bit-for-bit: compare raw double bits, not epsilon
      rows.foreach { r =>
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"dot mismatch: $r")
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"dist2 mismatch: $r")
      }
    }
    // edge cases: empty arrays -> 0.0; length mismatch -> null; null array -> null
    val edge = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))),
      (None, Some(Seq(1.0f)))).toDF("a", "b")
    val got = edge.select(
      VectorOps.dot(col("a"), col("b")).as("n"),
      VectorOps.dotHof(col("a"), col("b")).as("h")).collect()
    assert(got.map(r => (r.get(0), r.get(1))).toSeq ==
      Seq((11.0, 11.0), (0.0, 0.0), (null, null), (null, null)))
  }

  test("native WinnowSketchExpr == HOF form on random arrays and edge cases") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val rnd = new scala.util.Random(11)
    // small value range forces duplicate minima (the dedup path);
    // lengths 0..6 cross the m<w, m==w, m>w regimes for w=4
    val data = (0 until 300).map { _ =>
      Seq.fill(rnd.nextInt(7))(rnd.nextInt(8).toLong)
    } :+ Seq.empty[Long]
    val df = data.toDF("hs")
    for (w <- Seq(1, 3, 4)) {
      val native = ColumnBridge.column(
        graft.functions.WinnowSketchExpr(ColumnBridge.expression(col("hs")), w))
      val hof = array_distinct(transform(
        sequence(lit(0), greatest(size(col("hs")) - w, lit(0))),
        i => array_min(slice(col("hs"), i + lit(1), lit(w)))))
      val rows = df.select(native.as("n"), hof.as("h")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Any](0) === r.getSeq[Any](1), s"w=$w input mismatch: $r")
      }
    }
    // null array → null; null elements skipped like array_min
    val edge = Seq(Option.empty[Seq[Option[Long]]],
      Some(Seq(Some(5L), None, Some(2L))), Some(Seq(Option.empty[Long]))).toDF("hs")
    val nat = ColumnBridge.column(
      graft.functions.WinnowSketchExpr(ColumnBridge.expression(col("hs")), 2))
    val got = edge.select(nat).collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Any](0))
    assert(got(0) === null)
    assert(got(1) === Seq(5L, 2L))
    assert(got(2) === Seq(null))
  }

  test("native NgramHashExpr == HOF rolling-fold forms on random arrays and edge cases") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.operators.Dedup
    val rnd = new scala.util.Random(17)
    // domain values in [0, P); small lengths cross m==0, m<n, m==n, m>n;
    // duplicate-heavy values exercise the fused distinct
    val data = (0 until 300).map { _ =>
      Seq.fill(rnd.nextInt(9))(
        if (rnd.nextBoolean()) rnd.nextInt(5).toLong else rnd.nextLong(2147483647L))
    } :+ Seq.empty[Long]
    val df = data.toDF("hs")
    for (n <- Seq(1, 2, 3, 5)) {
      def native(distilled: Boolean) = ColumnBridge.column(
        graft.functions.NgramHashExpr(ColumnBridge.expression(col("hs")), n, distilled))
      val rows = df.select(
        native(distilled = true).as("nd"), Dedup.hofShingleHashes(col("hs"), n).as("hd"),
        native(distilled = false).as("nr"), Dedup.hofRolledGramHashes(col("hs"), n).as("hr"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Any](0) === r.getSeq[Any](1), s"n=$n distilled mismatch: $r")
        assert(r.getSeq[Any](2) === r.getSeq[Any](3), s"n=$n raw mismatch: $r")
      }
    }
    // null array → null; null LEADING hash → null gram (kept once by the
    // distilled form, positionally by the raw form); null TRAILING hash
    // coalesces to 0 exactly like the short-document zero padding
    val edge = Seq(Option.empty[Seq[Option[Long]]],
      Some(Seq(Some(5L), None, Some(2L), Some(5L))),
      Some(Seq(None, None)), Some(Seq(Some(7L)))).toDF("hs")
    for (distilled <- Seq(true, false)) {
      val nat = ColumnBridge.column(
        graft.functions.NgramHashExpr(ColumnBridge.expression(col("hs")), 2, distilled))
      val hof = if (distilled) Dedup.hofShingleHashes(col("hs"), 2)
                else Dedup.hofRolledGramHashes(col("hs"), 2)
      val got = edge.select(nat.as("n"), hof.as("h")).collect()
      got.foreach { r =>
        val nv = if (r.isNullAt(0)) null else r.getSeq[Any](0)
        val hv = if (r.isNullAt(1)) null else r.getSeq[Any](1)
        assert(nv === hv, s"distilled=$distilled edge mismatch: $r")
      }
      // null array: distilled → null (distinct(slice(null)) is null);
      // raw → [] (when(size(null) >= n) takes the otherwise branch)
      assert(got(0).isNullAt(0) == distilled)
    }
  }

  test("native TokenHashExpr == HOF transform/aggregate forms, incl. null tokens") {
    val s = spark; import s.implicits._
    import graft.functions.GraftFunctions.{hash60, tokenFoldHash, tokenHashes}
    val P = 2147483647L
    val data = Seq(
      Some(Seq(Some("the"), Some("quick"), Some("brown"), Some("fox"))),
      Some(Seq(Some("a"))),
      Some(Seq.empty[Option[String]]),
      Some(Seq(Some("x"), None, Some("y"))), // null token mid-array
      Option.empty[Seq[Option[String]]])     // null array
    val df = data.toDF("tk")
    val hofElem = transform(col("tk"), t => pmod(hash60(t), lit(P)))
    val hofFold = aggregate(col("tk"), lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + pmod(hash60(t), lit(P)), lit(P)))
    df.select(tokenHashes(col("tk")).as("n"), hofElem.as("h"),
        tokenFoldHash(col("tk")).as("nf"), hofFold.as("hf"))
      .collect().foreach { r =>
        def v(i: Int): Any = if (r.isNullAt(i)) null else r.get(i)
        assert(v(0) === v(1), s"elementwise mismatch: $r")
        assert(v(2) === v(3), s"fold mismatch: $r")
      }
    // SQL registration: token_fold_hash(['the','a']) folds the two hashes
    val got = spark.sql(
      "SELECT token_hashes(array('the', 'a')) AS th, token_fold_hash(array('the', 'a')) AS tf")
      .collect().head
    val Seq(h0, h1) = got.getSeq[Long](0)
    assert(got.getLong(1) === ((h0 * 1000003L + h1) % P))
    // simhash60 of a single token: bits = that token's hash60 bits
    // (1 vote of 1 ⇒ every set bit wins); low 60 bits of hash60 match
    val sim = spark.sql("SELECT simhash60(array('the')) AS s, hash60('the') AS h").collect().head
    assert(sim.getLong(0) === (sim.getLong(1) & ((1L << 60) - 1)))
  }

  test("the shared full-hash layer derives every reduced form exactly") {
    // fullHashBase persists ONE unreduced md5 pass; gram folds reduce mod P
    // as they read (NgramHashExpr.reduceInputs) and SimHash votes on the
    // bits directly (SimHash60Expr.preHashed). Each derivation must equal
    // the direct single-operator chain bit-for-bit — that equivalence is
    // what lets winnow/ngramJaccard/simhash share the layer without
    // touching their oracles.
    val s = spark; import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.functions.GraftFunctions.{tokenHashes, tokenHashesFull}
    val P = 2147483647L
    val data = Seq(
      Some(Seq(Some("the"), Some("quick"), Some("brown"), Some("fox"), Some("the"))),
      Some(Seq(Some("a"))),
      Some(Seq.empty[Option[String]]),
      Some(Seq(Some("x"), None, Some("y"))), // null token mid-array
      Option.empty[Seq[Option[String]]])     // null array
    val df = data.toDF("tk")
      .select(col("tk"), tokenHashes(col("tk")).as("hs"), tokenHashesFull(col("tk")).as("fh"))
    // pmod(full, P) == reduced
    df.select(col("hs"), transform(col("fh"), h => pmod(h, lit(P))).as("fh_red"))
      .collect().foreach { r =>
        def v(i: Int): Any = if (r.isNullAt(i)) null else r.getSeq[Any](i)
        assert(v(0) === v(1), s"mod-P reduction mismatch: $r")
      }
    // gram folds over the full layer == folds over the reduced layer
    for (distilled <- Seq(true, false); n <- Seq(2, 3)) {
      def gram(c: String, reduce: Boolean) = ColumnBridge.column(
        graft.functions.NgramHashExpr(ColumnBridge.expression(col(c)), n,
          distilled = distilled, reduceInputs = reduce))
      df.select(gram("hs", reduce = false).as("a"), gram("fh", reduce = true).as("b"))
        .collect().foreach { r =>
          def v(i: Int): Any = if (r.isNullAt(i)) null else r.getSeq[Any](i)
          assert(v(0) === v(1), s"distilled=$distilled n=$n gram mismatch: $r")
        }
    }
    // simhash over the full layer == simhash over the token strings
    def sim(c: String, pre: Boolean) = ColumnBridge.column(
      graft.functions.SimHash60Expr(ColumnBridge.expression(col(c)), preHashed = pre))
    df.select(sim("tk", pre = false).as("a"), sim("fh", pre = true).as("b"))
      .collect().foreach { r =>
        def v(i: Int): Any = if (r.isNullAt(i)) null else r.get(i)
        assert(v(0) === v(1), s"simhash preHashed mismatch: $r")
      }
  }

  test("TermCountsExpr explode == explode/groupBy-count rows, incl. dups and null tokens") {
    val s = spark; import s.implicits._
    import graft.functions.GraftFunctions.termCounts
    val rnd = new scala.util.Random(31)
    val data = (0 until 120).map { i =>
      (i.toLong, Some(Seq.tabulate(rnd.nextInt(15))(j =>
        if (rnd.nextInt(20) == 0) None else Some("t" + rnd.nextInt(6))).flatten
        .map(Option(_)) ++ (if (rnd.nextInt(10) == 0) Seq(None) else Nil)))
    } :+ ((998L, Some(Seq.empty[Option[String]]))) :+ ((999L, Option.empty[Seq[Option[String]]]))
    val df = data.toDF("id", "tk")
    val native = df.select(col("id"), explode(termCounts(col("tk"))).as("tc"))
      .select(col("id"), col("tc.token"), col("tc.tf"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1), r.getLong(2)))
      .toSet
    val agg = df.select(col("id"), explode(col("tk")).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).cast("long").as("tf"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1), r.getLong(2)))
      .toSet
    assert(native === agg)
  }

  test("SortedIntersectSizeExpr == size(array_intersect) on random sorted arrays with dups") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val rnd = new scala.util.Random(23)
    // small domain forces collisions and duplicates; include empties
    val data = (0 until 400).map { _ =>
      (Seq.fill(rnd.nextInt(12))(rnd.nextInt(15).toLong),
       Seq.fill(rnd.nextInt(12))(rnd.nextInt(15).toLong))
    }
    val df = data.toDF("a", "b")
      .select(array_sort(col("a")).as("a"), array_sort(col("b")).as("b"))
    val native = ColumnBridge.column(graft.functions.SortedIntersectSizeExpr(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b"))))
    df.select(native.as("n"), size(array_intersect(col("a"), col("b"))).as("h"))
      .collect().foreach(r => assert(r.getInt(0) === r.getInt(1), r))
    // null array propagates to null, like size(array_intersect(...))
    val withNull = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(withNull.select(ColumnBridge.column(graft.functions.SortedIntersectSizeExpr(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")))))
      .collect().head.isNullAt(0))
  }

  test("shingle_hashes / gram_hashes are registered for SQL; widths validated") {
    // tokens [9, 4, 7]: grams of 2 = [(9*B+4)%P, (4*B+7)%P]
    val b = 1000003L; val p = 2147483647L
    val g0 = (9 * b + 4) % p; val g1 = (4 * b + 7) % p
    val got = spark.sql(
      "SELECT shingle_hashes(array(9L, 4L, 7L), 2) AS s, gram_hashes(array(9L), 2) AS g").collect()
    assert(got.head.getSeq[Long](0) === Seq(g0, g1))
    assert(got.head.getSeq[Long](1) === Seq.empty)
    // fractional width must ERROR, not silently truncate (winnow too)
    for (q <- Seq("SELECT shingle_hashes(array(1L), 2.5)",
                  "SELECT winnow_sketch(array(1L), 2.5)")) {
      val e = intercept[Exception](spark.sql(q).collect())
      assert(e.getMessage.contains("integral literal"), s"$q: ${e.getMessage}")
    }
  }

  test("winnow_sketch is registered for SQL via GraftExtensions") {
    // windows of 2: (5,3)→3 (3,4)→3 (4,9)→4 (9,8)→8, distinct in order
    val got = spark.sql(
      "SELECT winnow_sketch(array(5L, 3L, 4L, 9L, 8L), 2) AS s").collect()
    assert(got.head.getSeq[Long](0) === Seq(3L, 4L, 8L))
  }

  test("scalar surface: initialism, zeroToSentinel, stripUrlSuffix, durationSeconds") {
    val s = spark; import s.implicits._
    val row = Seq(("property-centroid", "0", "https://x/api/query"))
      .toDF("slug", "lot", "url")
      .select(
        GraftFunctions.initialism(col("slug")).as("init"),
        GraftFunctions.zeroToSentinel(col("lot")).as("lot"),
        GraftFunctions.stripUrlSuffix(col("url")).as("url"),
        GraftFunctions.durationSeconds(
          lit("2026-01-01 00:00:00").cast("timestamp"),
          lit("2026-01-01 01:30:00").cast("timestamp")).as("dur"))
      .head()
    assert(row.getString(0) == "PC")
    assert(row.getString(1) == "9999")
    assert(row.getString(2) == "https://x/api")
    assert(row.getString(3) == "5400.000")
    // 4-char truncation: water-meter-location-extra-parts -> WMLE
    val init4 = Seq("water-meter-location-extra-parts").toDF("s")
      .select(GraftFunctions.initialism(col("s"))).head().getString(0)
    assert(init4 == "WMLE")
  }

  test("native codebook kernels == struct/array_min formulation, bit-for-bit") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    import graft.functions.{NearestCellExpr, NearestCellsExpr, VectorOps}
    val rnd = new scala.util.Random(7)
    val cb: IndexedSeq[IndexedSeq[Double]] =
      IndexedSeq.fill(5)(IndexedSeq.fill(8)(rnd.nextDouble() * 2 - 1))
    // the pre-kernel formulation this replaced (Similarity.assignStruct r9)
    def oldStructs(v: org.apache.spark.sql.Column) =
      array(cb.indices.map { i =>
        struct(VectorOps.dist2(v, array(cb(i).map(lit): _*)).as("d"), lit(i).as("cell"))
      }: _*)
    // real float vectors, duplicated rows (forces argmin ties through
    // identical distances), plus a malformed short vector
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.slice(col("embedding"), 1, 8).as("v")).limit(32)
    val withDup = emb.union(emb.limit(3))
      .union(spark.sql("SELECT array(CAST(1.0 AS FLOAT)) AS v"))
    val rows = withDup.select(
      toCol(NearestCellExpr(toExpr(col("v")), cb)).as("n"),
      array_min(oldStructs(col("v"))).as("o"),
      toCol(NearestCellsExpr(toExpr(col("v")), cb, 3)).as("nn"),
      transform(slice(array_sort(oldStructs(col("v"))), 1, 3),
        s => s.getField("cell")).as("oo")).collect()
    assert(rows.length == 36)
    rows.foreach { r =>
      val (n, o) = (r.getStruct(0), r.getStruct(1))
      assert(n.isNullAt(0) == o.isNullAt(0), s"d nullability: $r")
      if (!n.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(n.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(o.getDouble(0)), s"d bits: $r")
      assert(n.getInt(1) == o.getInt(1), s"cell: $r")
      assert(r.getSeq[Int](2) == r.getSeq[Int](3), s"probe list: $r")
    }
  }

  test("codebook kernels: NULL vector is null out (row drops from cell joins); malformed vector is (null, 0) / [0..n-1]") {
    // The documented contract (CodebookExpr scaladoc): a null INPUT VECTOR
    // yields null — so a null-embedding row joins nothing in
    // ivfTopK/semanticDedup/kmeansAssign (no cosine or cell is definable
    // for it), which is intended; a MALFORMED vector (wrong length / null
    // element) reproduces the old struct/array_min path's (null, cell 0)
    // and [0..n-1]. Locked here so the difference stays deliberate.
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    import graft.functions.{NearestCellExpr, NearestCellsExpr}
    val cb: IndexedSeq[IndexedSeq[Double]] = IndexedSeq(IndexedSeq(0.0, 0.0), IndexedSeq(1.0, 1.0))
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('null_vec',  CAST(NULL AS ARRAY<DOUBLE>)),
        |  ('short_vec', array(CAST(9.0 AS DOUBLE))),
        |  ('null_elem', array(CAST(NULL AS DOUBLE), CAST(2.0 AS DOUBLE))),
        |  ('good',      array(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) AS t(tag, v)""".stripMargin)
      .select(col("tag"),
        toCol(NearestCellExpr(toExpr(col("v")), cb)).as("n"),
        toCol(NearestCellsExpr(toExpr(col("v")), cb, 2)).as("nn"))
    val byTag = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byTag("null_vec").isNullAt(1) && byTag("null_vec").isNullAt(2))
    for (tag <- Seq("short_vec", "null_elem")) {
      val s = byTag(tag).getStruct(1)
      assert(s.isNullAt(0) && s.getInt(1) == 0, s"$tag struct: $s")
      assert(byTag(tag).getSeq[Int](2) == Seq(0, 1), s"$tag probe list")
    }
    val good = byTag("good").getStruct(1)
    assert(!good.isNullAt(0) && good.getInt(1) == 1)
    assert(byTag("good").getSeq[Int](2) == Seq(1, 0))
  }

  test("Cos6RawExpr: round(cos_raw, 6) == builtin when/isnan guard, incl. zero-norm/NaN/null edges") {
    val s = spark
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    // every (dot, na, nb) class the guard distinguishes: well-formed,
    // zero denominator (one/both norms 0), NaN ratio (NaN dot / NaN norm),
    // Inf/Inf, null inputs — pinned against the builtin formulation the
    // expression replaced (same tree the DuckDB oracle mirrors)
    val df = s.sql(
      """SELECT * FROM VALUES
        |  (6.0D,  2.0D, 3.0D),
        |  (-1e-9D, 1.0D, 1.0D),
        |  (6.0D,  0.0D, 3.0D),
        |  (0.0D,  0.0D, 0.0D),
        |  (CAST('NaN' AS DOUBLE), 2.0D, 3.0D),
        |  (6.0D,  CAST('NaN' AS DOUBLE), 3.0D),
        |  (CAST('Infinity' AS DOUBLE), CAST('Infinity' AS DOUBLE), 1.0D),
        |  (CAST(NULL AS DOUBLE), 2.0D, 3.0D),
        |  (6.0D, CAST(NULL AS DOUBLE), 3.0D),
        |  (6.0D, 2.0D, CAST(NULL AS DOUBLE)) AS t(dot, na, nb)""".stripMargin)
    val d = col("na") * col("nb")
    val raw = col("dot") / d
    val builtin = when(d === 0.0 || isnan(raw), lit(null).cast("double"))
      .otherwise(round(raw, 6))
    val native = round(toCol(graft.functions.Cos6RawExpr(
      toExpr(col("dot")), toExpr(col("na")), toExpr(col("nb")))), 6)
    val rows = df.select(builtin.as("b"), native.as("n")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"value mismatch: $r")
    }
    // the whole point: ONE vec_dot evaluation per pair — the dot child
    // appears once in the expression tree, so a pushed-down copy of the
    // predicate costs one dot per evaluation, not two
    assert(df.select(native.as("c")).queryExecution.analyzed.expressions
      .flatMap(_.collect { case _: graft.functions.Cos6RawExpr => 1 }).sum == 1)
  }
}
