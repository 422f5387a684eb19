package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.GraftSuite

/** The codegen'd kernels vs straightforward Scala references, on both
  * execution paths (whole-stage codegen on/off => doGenCode and
  * nullSafeEval are BOTH exercised), plus the SQL registration. */
class VectorKernelSpec extends GraftSuite {

  private def refDot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  private def refCos(a: Seq[Double], b: Seq[Double]): Double =
    refDot(a, b) / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b)))

  private def refTokenHash(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)

  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[(Seq[Double], Seq[Double])] =
    Seq.fill(20)((Seq.fill(16)(rnd.nextGaussian()), Seq.fill(16)(rnd.nextGaussian())))

  private def withCodegen[A](on: Boolean)(body: => A): A = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    try body finally spark.conf.set(key, old)
  }

  private def runKernels(): Seq[Row] = {
    import spark.implicits._
    vecs.toDF("a", "b")
      .select(vec.dot(col("a"), col("b")).as("dot"),
              vec.cosine(col("a"), col("b")).as("cos"))
      .collect().toSeq
  }

  for (codegen <- Seq(true, false)) {
    test(s"vec_dot / vec_cosine match the Scala reference (codegen=$codegen)") {
      val rows = withCodegen(codegen)(runKernels())
      rows.zip(vecs).foreach { case (r, (a, b)) =>
        assert(math.abs(r.getDouble(0) - refDot(a, b)) < 1e-9)
        assert(math.abs(r.getDouble(1) - refCos(a, b)) < 1e-9)
      }
    }
  }

  test("cosine self-similarity is 1, symmetry holds") {
    import spark.implicits._
    val df = vecs.toDF("a", "b")
    val rows = df.select(vec.cosine(col("a"), col("a")).as("self"),
                         (vec.cosine(col("a"), col("b")) -
                          vec.cosine(col("b"), col("a"))).as("asym")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1)) < 1e-12)
    }
  }

  test("null array -> null result (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(vec.dot(col("a"), col("b")), vec.cosine(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  for (codegen <- Seq(true, false)) {
    test(s"mismatched dimensions -> null, not a silent partial product (codegen=$codegen)") {
      import spark.implicits._
      val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
      val r = withCodegen(codegen) {
        df.select(vec.dot(col("a"), col("b")), vec.cosine(col("a"), col("b"))).collect()(0)
      }
      assert(r.isNullAt(0) && r.isNullAt(1))
    }
  }

  test("token_hash matches reference fold and the interpreted HOF formulation") {
    import spark.implicits._
    val toks = Seq("data", "stream", "x", "", "a1b2c3", "zzzzzzzzzz")
    val df = toks.toDF("t")
    val got = df.select(vec.tokenHash(col("t"))).as[Long].collect().toSeq
    assert(got === toks.map(refTokenHash))
  }

  private def refSimHash(toks: Seq[String]): Long = {
    // the EXPLODED tf-weighted formulation the oracle replays: distinct
    // hashes with term frequencies, +-tf votes per bit, s > 0 sets the bit
    val tf = toks.map(refTokenHash).groupBy(identity).view.mapValues(_.size.toLong)
    (0 until 16).map { i =>
      val s = tf.map { case (h, f) => if (((h >> i) & 1L) == 1L) f else -f }.sum
      if (s > 0) 1L << i else 0L
    }.sum
  }

  for (codegen <- Seq(true, false)) {
    test(s"simhash16 matches the exploded tf-weighted reference (codegen=$codegen)") {
      import spark.implicits._
      val r = new scala.util.Random(67)
      val vocab = Seq("data", "stream", "merge", "batch", "scan", "x", "yz")
      val cases: Seq[Seq[String]] = Seq.fill(200)(
        Seq.fill(1 + r.nextInt(30))(vocab(r.nextInt(vocab.length))))
      val got = withCodegen(codegen) {
        cases.toDF("toks").select(vec.simhash16(col("toks"))).as[Long].collect().toSeq
      }
      assert(got === cases.map(refSimHash))
    }
  }

  private def refSimHash64(toks: Seq[String]): Long = {
    // independent replay of the 64-bit kernel: splitmix64-finalized base
    // hash, tf-weighted +-votes per bit, s > 0 sets the bit
    def mix(z0: Long): Long = {
      var z = (z0 ^ (z0 >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val tf = toks.map(t => mix(refTokenHash(t))).groupBy(identity)
      .view.mapValues(_.size.toLong)
    (0 until 64).map { i =>
      val s = tf.map { case (h, f) => if (((h >>> i) & 1L) == 1L) f else -f }.sum
      if (s > 0) 1L << i else 0L
    }.sum
  }

  for (codegen <- Seq(true, false)) {
    test(s"simhash64 matches the mixed tf-weighted reference (codegen=$codegen)") {
      import spark.implicits._
      val r = new scala.util.Random(284)
      val vocab = Seq("data", "stream", "merge", "batch", "scan", "x", "yz")
      val cases: Seq[Seq[String]] = Seq.fill(200)(
        Seq.fill(1 + r.nextInt(30))(vocab(r.nextInt(vocab.length))))
      val got = withCodegen(codegen) {
        cases.toDF("toks").select(vec.simhash64(col("toks"))).as[Long].collect().toSeq
      }
      assert(got === cases.map(refSimHash64))
    }
  }

  test("simhash16: vote ties leave the bit clear; fingerprint is 16-bit") {
    import spark.implicits._
    // two tokens with complementary bit votes tie every differing bit to 0
    val rows = Seq(Seq.empty[String], Seq("data", "data", "stream"))
    val got = rows.toDF("toks").select(vec.simhash16(col("toks"))).as[Long].collect()
    assert(got(0) == 0L)                       // no votes -> all ties -> 0
    assert(got(1) == refSimHash(rows(1)))
    assert(got.forall(h => h >= 0 && h < (1L << 16)))
  }

  test("kernels are registered as SQL functions via GraftExtensions") {
    val r = spark.sql(
      """SELECT vec_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d,
        |       ROUND(vec_cosine(array(1d, 0d), array(1d, 0d)), 9) AS c,
        |       token_hash('ab') AS h""".stripMargin).collect()(0)
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getLong(2) === ('a'.toLong * 31 + 'b'.toLong) % 1000000007L)
  }

  for (codegen <- Seq(true, false)) {
    test(s"word_shingles matches a naive sliding reference on random arrays (codegen=$codegen)") {
      import spark.implicits._
      val r = new scala.util.Random(11)
      val cases: Seq[Seq[String]] = Seq.fill(200)(
        Seq.fill(r.nextInt(8))(Seq.fill(1 + r.nextInt(5))("abcxyz".charAt(r.nextInt(6))).mkString))
      for (k <- 1 to 3) {
        val got = withCodegen(codegen) {
          cases.toDF("toks")
            .select(vec.wordShingles(col("toks"), k)).as[Seq[String]].collect().toSeq
        }
        val want = cases.map(ts => if (ts.length < k) Seq.empty[String]
                                   else ts.sliding(k).map(_.mkString(" ")).toSeq)
        assert(got === want, s"k=$k")
      }
    }

    test(s"vec_dot matches the reference across random dimensions (codegen=$codegen)") {
      import spark.implicits._
      val r = new scala.util.Random(13)
      val cases = Seq.fill(100) {
        val d = 1 + r.nextInt(64)
        (Seq.fill(d)(r.nextGaussian()), Seq.fill(d)(r.nextGaussian()))
      }
      val got = withCodegen(codegen) {
        cases.toDF("a", "b").select(vec.dot(col("a"), col("b")))
          .as[Double].collect().toSeq
      }
      got.zip(cases).foreach { case (g, (a, b)) =>
        assert(math.abs(g - refDot(a, b)) < 1e-9)
      }
    }
  }

  test("float embeddings cast natively to array<double> for the kernels") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(vec.dot(col("a").cast("array<double>"),
                              col("b").cast("array<double>"))).collect()(0)
    assert(math.abs(r.getDouble(0) - 11.0) < 1e-9)
  }
}
