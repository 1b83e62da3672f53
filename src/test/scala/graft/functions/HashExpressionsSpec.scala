package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.{MinHashLSH, SimHash}
import graft.functions.{TextFunctions => TF}

/** The compiled hash expressions must be bit-identical to the HOF reference
  * implementations (which in turn mirror the DuckDB oracle SQL).
  */
class HashExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    .limit(100)

  test("MinHashSignature == HOF signatureFromHashes(unitHashes)") {
    val sh = docs.select($"doc_id", TF.shingles($"text", 3).as("sh"))
    val both = sh.select($"doc_id",
      HashExpressions.minhashSignature($"sh", 16,
        MinHashLSH.A.take(16), MinHashLSH.B.take(16)).as("fast"),
      MinHashLSH.signature($"sh", 16).as("ref"))
    assert(both.filter(not($"fast" === $"ref")).isEmpty)
  }

  test("SimHashFingerprint == HOF fingerprint") {
    val t = docs.select($"doc_id", TF.tokens($"text").as("toks"))
    val both = t.select(
      HashExpressions.simhashFingerprint($"toks").as("fast"),
      SimHash.fingerprint($"toks").as("ref"))
    assert(both.filter($"fast" =!= $"ref").isEmpty)
  }

  test("zero-norm cosine convention: 0.0 on both codegen and interpreted paths, and in VectorFunctions") {
    val rows = Seq(
      (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 2.0f, 3.0f)),   // zero left
      (Seq(1.0f, 2.0f, 3.0f), Seq(0.0f, 0.0f, 0.0f)),   // zero right
      (Seq(0.0f, 0.0f, 0.0f), Seq(0.0f, 0.0f, 0.0f)),   // both zero
      (Seq(1.0f, 0.0f, 0.0f), Seq(1.0f, 0.0f, 0.0f))    // sanity: cos=1
    ).toDF("a", "b")
    val viaExpr = rows.select(
      HashExpressions.cosineSim($"a", $"b").as("c")).as[Double].collect().toSeq
    assert(viaExpr === Seq(0.0, 0.0, 0.0, 1.0))
    // the HOF column path (ANSI mode would throw DIVIDE_BY_ZERO unguarded)
    val viaHof = rows.select(round(VectorFunctions.cosine(
        VectorFunctions.toDouble($"a"), VectorFunctions.toDouble($"b")), 6).as("c"))
      .as[Double].collect().toSeq
    assert(viaHof === Seq(0.0, 0.0, 0.0, 1.0))
    val viaQuery = rows.select(round(VectorFunctions.cosineToQuery(
        VectorFunctions.toDouble($"a"), Seq(0.0, 0.0, 0.0)), 6).as("c"))
      .as[Double].collect().toSeq
    assert(viaQuery === Seq(0.0, 0.0, 0.0, 0.0))        // zero QUERY vector
  }

  test("hash60Bytes matches the SQL-visible conv(substring(md5,1,15),16,10)") {
    val vals = Seq("", "a", "spark window batch", "日本語").toDF("s")
    val both = vals.select(
      TF.hash60($"s").as("ref"),
      HashExpressions.minhashSignature(array($"s"), 1,
        Array(1L), Array(0L)).getItem(0).as("viaExpr"))
    // with a=1, b=0: signature[0] = hash60(s) % P
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) % HashExpressions.P)
    }
  }

  test("ShingleHash60Array (set mode) == hash60Array(TF.shingles) incl. edges") {
    // corpus rows + the hostile edge fixtures: null text, empty, spaces,
    // exactly w, below w, repeated shingles, unicode
    val edge = Seq("", " ", "a", "a b", "a b c", "a b c d",
      "x y x y x y x y", "ü ß 語 ü ß 語", null)
      .toDF("text")
    for (w <- Seq(3, 8)) {
      val both = docs.select($"text").unionByName(edge).select(
        HashExpressions.shingleHash60Array(TF.tokens($"text"), w).as("fast"),
        HashExpressions.hash60Array(TF.shingles($"text", w)).as("ref"))
      assert(both.filter(not($"fast" <=> $"ref")).isEmpty, s"w=$w")
    }
  }

  test("ShingleHash60Array (positional mode) == the inline transform lattice") {
    val edge = Seq("", "a b c", "a b c d", "x y x y x y", null).toDF("text")
    for (w <- Seq(4, 8)) {
      val t = TF.tokens($"text")
      val ref = when(size(t) >= w, transform(sequence(lit(0), size(t) - w),
          i => TF.hash60(array_join(slice(t, i + 1, lit(w)), " "))))
        .otherwise(array().cast("array<long>"))
      val both = docs.select($"text").unionByName(edge).select(
        HashExpressions.positionalShingleHash60(TF.tokens($"text"), w)
          .as("fast"),
        ref.as("ref"))
      assert(both.filter(not($"fast" <=> $"ref")).isEmpty, s"w=$w")
    }
  }

  // ----- fused-kernel equivalence over RAW token arrays (nulls included) ----
  // TF.tokens never emits null/empty elements, but the kernel is a public
  // helper: it must mirror array_join's null-skipping (ADVICE round-8) and
  // be bit-identical between the interpreted eval and the generated Java.

  /** Set-mode HOF composite over a token-ARRAY column (TF.shingles inlined
    * past the tokenizer) — the semantics contract the kernel must match.
    */
  private def setModeRef(t: org.apache.spark.sql.Column, w: Int) =
    array_sort(transform(
      when(size(t) >= w,
        array_distinct(transform(sequence(lit(0), size(t) - w), i =>
          array_join(slice(t, i + 1, lit(w)), " "))))
        .otherwise(array(array_join(t, " "))),
      TF.hash60 _))

  private def posModeRef(t: org.apache.spark.sql.Column, w: Int) =
    when(size(t) >= w, transform(sequence(lit(0), size(t) - w), i =>
      TF.hash60(array_join(slice(t, i + 1, lit(w)), " "))))
      .otherwise(array().cast("array<long>"))

  test("ShingleHash60Array skips null elements like array_join (no NPE)") {
    val rows: Seq[Seq[String]] = Seq(
      Seq("a", null, "b", "c"),          // null mid-window
      Seq(null, null),                   // all-null, below w
      Seq(null, "a", null),              // null at both edges
      Seq("a", "", "b"),                 // empty-string token (NOT skipped)
      null                               // null array
    )
    val df = rows.toDF("t")
    for (w <- Seq(2, 3)) {
      val both = df.select(
        HashExpressions.shingleHash60Array($"t", w).as("fast"),
        setModeRef($"t", w).as("ref"),
        HashExpressions.positionalShingleHash60($"t", w).as("fastp"),
        posModeRef($"t", w).as("refp"))
      assert(both.filter(not($"fast" <=> $"ref") or not($"fastp" <=> $"refp"))
        .isEmpty, s"w=$w")
    }
  }

  test("property: kernel ≡ composite AND interpreted ≡ codegen on random arrays") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}

    val token: Gen[String] = Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c", "dup", "ü語"),
      1 -> Gen.const(null: String),
      1 -> Gen.const(""))
    val arrGen: Gen[Seq[String]] = Gen.frequency(
      1 -> Gen.const(null: Seq[String]),
      9 -> Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, token).map(_.toSeq)))
    val samples: Seq[Seq[String]] =
      (0 until 200).map(i => arrGen.pureApply(Gen.Parameters.default, Seed(9000L + i)))

    // (a) interpreted eval ≡ generated-code eval, per sample, both modes
    val inType = ArrayType(StringType, containsNull = true)
    val conv = CatalystTypeConverters.createToCatalystConverter(inType)
    def elems(a: ArrayData): Seq[Option[Long]] =
      (0 until a.numElements()).map(i =>
        if (a.isNullAt(i)) None else Some(a.getLong(i)))
    for (w <- Seq(1, 3, 8); positional <- Seq(false, true)) {
      val expr = HashExpressions.ShingleHash60Array(
        BoundReference(0, inType, nullable = true), w, positional)
      val proj = GenerateUnsafeProjection.generate(Seq(expr))
      samples.foreach { s =>
        val row = InternalRow(conv(s))
        val interp = elems(expr.eval(row).asInstanceOf[ArrayData])
        val gen = elems(proj(row).getArray(0))
        assert(interp === gen, s"w=$w positional=$positional input=$s")
      }
    }

    // (b) kernel ≡ HOF composite, whole sample set in one DataFrame pass
    val df = samples.toDF("t")
    for (w <- Seq(1, 3, 8)) {
      val both = df.select(
        HashExpressions.shingleHash60Array($"t", w).as("fast"),
        setModeRef($"t", w).as("ref"),
        HashExpressions.positionalShingleHash60($"t", w).as("fastp"),
        posModeRef($"t", w).as("refp"))
      assert(both.filter(not($"fast" <=> $"ref") or not($"fastp" <=> $"refp"))
        .isEmpty, s"w=$w")
    }
  }

  test("kernel survives task serialization inside whole-stage codegen") {
    // ShingleHash60Array.doGenCode puts the ShingleKernel MODULE into the
    // plan's references array; a stage whose WholeStageCodegen factory is
    // task-serialized (e.g. the map side of an exchange) then writes that
    // array out — which threw NotSerializableException until the object
    // was marked Serializable. This is the exact shape that failed (the
    // kernel inside a `when` projection feeding a shuffle), so keep it
    // exercising a real exchange, not a collect-only local plan.
    val out = docs
      .repartition(4)
      .select($"doc_id",
        when(size(TF.tokens($"text")) >= 3,
          HashExpressions.positionalShingleHash60(TF.tokens($"text"), 3))
          .otherwise(array().cast("array<long>")).as("hs"))
      .select(explode($"hs").as("h"))
      .groupBy($"h").count()
      .count()
    assert(out > 0)
  }
}
