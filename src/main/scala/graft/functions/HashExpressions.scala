package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftExprColumn
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hash-sketch hot paths.
  *
  * Why custom: Spark's higher-order functions (`transform`/`aggregate`) are
  * evaluated INTERPRETED per element — a MinHash signature as
  * k × `array_min(transform(...))` costs k·|units| boxed lambda calls per
  * row (≈128M for 5k docs × k=64 × 400 shingles). These expressions do the
  * same arithmetic in one compiled JVM pass per row. Every expression here
  * carries real `doGenCode` (round 9 — none is `CodegenFallback`, which
  * forces the host stage to materialize `ctx.INPUT_ROW` as an UnsafeRow
  * and pays a boxed `eval(row)` dispatch per row): the pair-hot join
  * conditions ([[CosineSim]], [[PqAssign]], [[SortedIntersectCount]])
  * inline their loops into the generated predicate, and the corpus-scan
  * kernels generate one direct call to the SAME compiled `compute` method
  * their interpreted path runs — bit-identity between eval modes by
  * construction. Semantics are bit-identical to the HOF versions (same
  * md5-based
  * 60-bit hash, same mod-P permutations), so the DuckDB oracle SQL is
  * unchanged — unit tests pin the equivalence.
  */
object HashExpressions {

  val P: Long = 2147483647L

  /** One MD5 per executor thread — `getInstance` per ROW costs a provider
    * lookup + allocation on every document of a corpus scan.
    */
  private[functions] val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** hash60(s) = first 15 hex chars of md5(s) as a long =
    * (big-endian first-8-bytes >>> 4) masked to 60 bits.
    */
  private[functions] def hash60Bytes(md: MessageDigest, s: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(s)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v >>> 4) & 0x0FFFFFFFFFFFFFFFL
  }

  /** array<string> OR array<long> → array<long>: the k MinHash minima over
    * md5-based 60-bit unit hashes mod P, permuted by the fixed (A, B)
    * parameters. Long input is treated as pre-computed [[Hash60Array]]
    * output (hash once, reuse for signature AND exact verification).
    * Empty input → array of P (no unit ever hashes to P since P > max mod).
    */
  case class MinHashSignature(child: Expression, k: Int, a: Array[Long], b: Array[Long])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val preHashed = child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    def compute(arr: ArrayData): ArrayData = {
      val md = if (preHashed) null else mdLocal.get()
      val mins = Array.fill(k)(P)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h =
          (if (preHashed) arr.getLong(i)
           else hash60Bytes(md, arr.getUTF8String(i).getBytes)) % P
        var j = 0
        while (j < k) {
          val p = (a(j) * h + b(j)) % P
          if (p < mins(j)) mins(j) = p
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
    /** Real codegen, the [[ShingleHash60Array]] device: the generated Java
      * calls the SAME compiled `compute` both eval modes share — what it
      * buys over CodegenFallback is staying inside whole-stage codegen
      * (no forced INPUT_ROW materialization, no boxed eval dispatch).
      */
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("minhashSig", this,
        classOf[MinHashSignature].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  /** array<string> → array<long>: 60-bit md5 hash per element, SORTED — the
    * set representation shared by the MinHash signature and the exact
    * set-intersection verification.
    */
  case class Hash60Array(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    def compute(arr: ArrayData): ArrayData = {
      val md = mdLocal.get()
      val n = arr.numElements()
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = hash60Bytes(md, arr.getUTF8String(i).getBytes)
        i += 1
      }
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }
    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("hash60Arr", this,
        classOf[Hash60Array].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Hash60Array = copy(child = c)
    override def prettyName: String = "hash60_array"
  }

  /** array<string> tokens → array<long>: fused w-token shingling + 60-bit
    * hashing in ONE compiled pass — the hot corpus-scan kernel behind every
    * shingle query. The HOF composite it replaces
    * (`hash60Array(TF.shingles(t, w))` or
    * `transform(sequence(...), i => hash60(array_join(slice(t,i,w))))`)
    * pays, per position: an interpreted lambda dispatch, a `slice` array
    * copy, an `array_join` string build, and (in the `TF.hash60` form) an
    * md5 → hex-substring → `conv` string round-trip; plus an
    * `array_distinct` pass over the shingle strings. Here each window is
    * joined into a reused builder and digested directly.
    *
    * Two modes, each bit-identical to its composite (unit-pinned):
    *  - `positional = false` (the `TF.shingles` contract): DISTINCT
    *    shingle strings (collisions keep both hashes, like the composite),
    *    SORTED output (the [[Hash60Array]] contract its consumers —
    *    [[SortedIntersectCount]], MinHash — rely on); `< w` tokens → one
    *    whole-doc shingle; a null token ARRAY → `[null]` (what
    *    `array(array_join(null))` produces — the row survives to a null
    *    hash exactly as before); null ELEMENTS are skipped the way
    *    `array_join` skips them.
    *  - `positional = true` (the q338 lattice contract): one hash per
    *    window position, UNSORTED and with repeats; `< w` or null → empty
    *    (the `otherwise(array())` branch).
    */
  case class ShingleHash60Array(child: Expression, w: Int, positional: Boolean)
      extends UnaryExpression {
    require(w >= 1, s"shingle width must be >= 1: $w")
    override def dataType: DataType =
      ArrayType(LongType, containsNull = !positional)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) ShingleKernel.nullInput(positional)
      else ShingleKernel.run(v.asInstanceOf[ArrayData], w, positional)
    }
    /** Real codegen (no CodegenFallback): the fused loop lives in
      * [[ShingleKernel.run]] — one already-JIT-compiled method both eval
      * modes share, so interpreted/codegen bit-identity holds by
      * construction. What codegen buys over the fallback is staying inside
      * whole-stage codegen: CodegenFallback forces the surrounding stage to
      * materialize `ctx.INPUT_ROW` as a full UnsafeRow and pays a boxed
      * `Expression.eval(row)` dispatch per row; here the generated Java
      * evaluates the child in place and makes one direct (inlineable,
      * megamorphism-free) call on the kernel reference.
      */
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val childGen = child.genCode(ctx)
      val kernel = ctx.addReferenceObj("shingleKernel", ShingleKernel,
        "graft.functions.ShingleKernel$")
      val javaType = CodeGenerator.javaType(dataType)
      ev.copy(
        code = code"""
          |${childGen.code}
          |$javaType ${ev.value} = ${childGen.isNull}
          |  ? $kernel.nullInput($positional)
          |  : $kernel.run(${childGen.value}, $w, $positional);
        """.stripMargin,
        isNull = FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): ShingleHash60Array =
      copy(child = c)
    override def prettyName: String = "shingle_hash60_array"
  }

  /** |a ∩ b| for two SORTED long arrays — one linear merge, no per-row hash
    * set (what `array_intersect` builds internally).
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var c = 0
      val na = a.numElements(); val nb = b.numElements()
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      java.lang.Integer.valueOf(c)
    }
    /** Real codegen with the loop INLINED (the [[CosineSim]] precedent,
      * and for the same reason: this merge is evaluated per candidate
      * PAIR inside verify joins — Θ(pairs) sites where even one call
      * dispatch per pair is visible).
      */
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
          |int $i = 0; int $j = 0; int $c = 0;
          |int $na = $a.numElements(); int $nb = $b.numElements();
          |while ($i < $na && $j < $nb) {
          |  long $x = $a.getLong($i); long $y = $b.getLong($j);
          |  if ($x == $y) { $c++; $i++; $j++; }
          |  else if ($x < $y) $i++;
          |  else $j++;
          |}
          |${ev.value} = $c;
        """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
      copy(left = l, right = r)
    override def prettyName: String = "sorted_intersect_count"
  }

  def hash60Array(units: Column): Column =
    GraftExprColumn.column(Hash60Array(GraftExprColumn.expression(units)))

  /** Fused `hash60Array(TF.shingles(tokens, w))` — sorted distinct-string
    * shingle hashes with the whole-doc fallback below `w`.
    */
  def shingleHash60Array(tokens: Column, w: Int): Column =
    GraftExprColumn.column(ShingleHash60Array(
      GraftExprColumn.expression(tokens), w, positional = false))

  /** Fused positional (non-distinct, unsorted) shingle hashes — the
    * q338 duplicated-span lattice contract; `< w` tokens → empty.
    */
  def positionalShingleHash60(tokens: Column, w: Int): Column =
    GraftExprColumn.column(ShingleHash60Array(
      GraftExprColumn.expression(tokens), w, positional = true))

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftExprColumn.column(SortedIntersectCount(
      GraftExprColumn.expression(a), GraftExprColumn.expression(b)))

  /** array<string> → long: 60-bit SimHash over the DISTINCT unit hashes
    * (set semantics, matching `array_distinct` + per-bit sign counting).
    */
  case class SimHashFingerprint(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    def compute(arr: ArrayData): Long = {
      val md = mdLocal.get()
      val seen = new java.util.HashSet[Long]()
      val counts = new Array[Int](60)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = hash60Bytes(md, arr.getUTF8String(i).getBytes)
        if (seen.add(h)) {
          var j = 0
          while (j < 60) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var fp = 0L
      var j = 0
      while (j < 60) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
      fp
    }
    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("simhashFp", this,
        classOf[SimHashFingerprint].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): SimHashFingerprint = copy(child = c)
    override def prettyName: String = "simhash_fingerprint"
  }

  /** NOTE on set semantics: distinct tokens can collide in hash60 (~2^-61
    * per pair); dedup happens on the HASH (as in the SQL oracle, which also
    * dedups on the token string — equivalent unless a collision occurs).
    */

  /** Cosine similarity of two float-array columns, compiled double loop
    * (the HOF zip_with/aggregate form costs |dims| interpreted lambda calls
    * per row-pair — prohibitive inside an all-pairs join).
    *
    * Real `doGenCode` (not CodegenFallback): this sits in JOIN CONDITIONS
    * evaluated Θ(n²/blocks) times, where even one boxed eval call per pair
    * (~µs) dwarfs the 64-dim loop (~100ns). With codegen the generated
    * predicate inlines the loop.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    // Element types resolve statically per side (array<float> corpus vector
    // vs array<double> centroid/query literal is the common mixed case), so
    // both eval and codegen pick the accessor once — no per-element branch.
    private def floatElems(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val lf = floatElems(left); val rf = floatElems(right)
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      // zero-norm convention: cosine 0.0 (see VectorFunctions.safeCos) —
      // 0/0 would yield NaN, which poisons downstream BigDecimal rounding
      if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
      else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        def acc(arr: String, e: Expression): String =
          if (floatElems(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
        s"""
          |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          |for (int $i = 0; $i < $n; $i++) {
          |  double $x = ${acc(a, left)};
          |  double $y = ${acc(b, right)};
          |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          |}
          |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
          |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
    override def prettyName: String = "cosine_sim"
  }

  /** Signed-random-projection signature: bit j = sign(dot(v, plane_j)) over
    * `nPlanes` deterministic pseudo-random hyperplanes (SplitMix64-derived,
    * so every engine/run agrees). The Hamming distance between signatures
    * estimates the angle — the LSH family for cosine similarity.
    */
  case class SrpSignature(child: Expression, nPlanes: Int)
      extends UnaryExpression {
    require(nPlanes <= 60, "signature packs into 60 bits")
    override def dataType: DataType = LongType
    private def planeComponent(j: Int, d: Int): Double = {
      // SplitMix64 of (j, d) → uniform in [-1, 1]
      var z = j.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble)
    }
    def compute(a: ArrayData): Long = {
      val n = a.numElements()
      var sig = 0L
      var j = 0
      while (j < nPlanes) {
        var dot = 0.0
        var d = 0
        while (d < n) { dot += a.getFloat(d).toDouble * planeComponent(j, d); d += 1 }
        if (dot > 0) sig |= (1L << j)
        j += 1
      }
      sig
    }
    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("srpSig", this,
        classOf[SrpSignature].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): SrpSignature = copy(child = c)
    override def prettyName: String = "srp_signature"
  }

  /** array<long> → array<struct<doc_a,doc_b>>: all C(n,2) ordered pairs of
    * a posting list (compiled; the nested-transform HOF form allocates
    * interpreted rows per element). Input should be sorted+distinct so
    * pair order is (smaller, larger).
    */
  case class OrderedPairs(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("doc_a", LongType, nullable = false),
        StructField("doc_b", LongType, nullable = false))),
      containsNull = false)
    def compute(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      val out = new Array[Any](n * (n - 1) / 2)
      var k = 0
      var i = 0
      while (i < n) {
        val a = arr.getLong(i)
        var j = i + 1
        while (j < n) {
          out(k) = InternalRow(a, arr.getLong(j))
          k += 1
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("orderedPairs", this,
        classOf[OrderedPairs].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): OrderedPairs = copy(child = c)
    override def prettyName: String = "ordered_pairs"
  }

  def orderedPairs(sortedIds: Column): Column =
    GraftExprColumn.column(OrderedPairs(GraftExprColumn.expression(sortedIds)))

  /** PQ code assignment: argmax over `cents` (array&lt;array&lt;double&gt;&gt;)
    * of cosine(sv, cents[c]), ties to the LOWEST index; zero-norm cosine is
    * 0.0 ([[CosineSim]]'s convention — an ascending strict-greater scan
    * reproduces the struct-max-on-(cos, -c) tie rule exactly).
    *
    * Exists for plan-compilation stability, not just per-row speed: the
    * centroid list is expected to be a complex-typed LITERAL child, which
    * codegen emits as a reference-array access — the generated source is
    * byte-identical across k-means iterations whose centroid VALUES differ,
    * so Lloyd's pays Janino once per training run instead of once per
    * iteration (the inlined-scalar-literals form recompiled a ~4000-node
    * tree every iteration; the interpreted-HOF form paid µs-scale lambda
    * overhead on every of the m·ksub·rows cosines).
    */
  case class PqAssign(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = IntegerType
    private def floatElems: Boolean = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val sv = l.asInstanceOf[ArrayData]
      val cs = r.asInstanceOf[ArrayData]
      val lf = floatElems
      var best = 0
      var bestCos = java.lang.Double.NEGATIVE_INFINITY
      var c = 0
      while (c < cs.numElements()) {
        val cent = cs.getArray(c)
        val n = math.min(sv.numElements(), cent.numElements())
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = if (lf) sv.getFloat(i).toDouble else sv.getDouble(i)
          val y = cent.getDouble(i)
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val cos = if (na == 0.0 || nb == 0.0) 0.0
          else dot / (math.sqrt(na) * math.sqrt(nb))
        if (cos > bestCos) { bestCos = cos; best = c }
        c += 1
      }
      java.lang.Integer.valueOf(best)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (sv, cs) => {
        val best = ctx.freshName("best")
        val bestCos = ctx.freshName("bestCos")
        val c = ctx.freshName("c")
        val cent = ctx.freshName("cent")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val cos = ctx.freshName("cos")
        val xAcc = if (floatElems) s"(double) $sv.getFloat($i)"
          else s"$sv.getDouble($i)"
        s"""
          |int $best = 0;
          |double $bestCos = java.lang.Double.NEGATIVE_INFINITY;
          |for (int $c = 0; $c < $cs.numElements(); $c++) {
          |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $cs.getArray($c);
          |  int $n = java.lang.Math.min($sv.numElements(), $cent.numElements());
          |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          |  for (int $i = 0; $i < $n; $i++) {
          |    double $x = $xAcc;
          |    double $y = $cent.getDouble($i);
          |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          |  }
          |  double $cos = ($na == 0.0 || $nb == 0.0) ? 0.0
          |    : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          |  if ($cos > $bestCos) { $bestCos = $cos; $best = $c; }
          |}
          |${ev.value} = $best;
        """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAssign =
      copy(left = l, right = r)
    override def prettyName: String = "pq_assign"
  }

  def pqAssign(sub: Column, cents: Column): Column =
    GraftExprColumn.column(PqAssign(
      GraftExprColumn.expression(sub), GraftExprColumn.expression(cents)))

  def cosineSim(a: Column, b: Column): Column =
    GraftExprColumn.column(CosineSim(
      GraftExprColumn.expression(a), GraftExprColumn.expression(b)))

  def srpSignature(v: Column, nPlanes: Int): Column =
    GraftExprColumn.column(SrpSignature(GraftExprColumn.expression(v), nPlanes))

  def minhashSignature(units: Column, k: Int, a: Array[Long], b: Array[Long]): Column =
    GraftExprColumn.column(
      MinHashSignature(GraftExprColumn.expression(units), k, a, b))

  def simhashFingerprint(units: Column): Column =
    GraftExprColumn.column(
      SimHashFingerprint(GraftExprColumn.expression(units)))
}

/** The fused shingle+hash loop behind [[HashExpressions.ShingleHash60Array]],
  * as a top-level object so the generated Java (which receives it via
  * `addReferenceObj`) and the interpreted `eval` call the SAME compiled
  * method — bit-identity between eval modes is structural, and the
  * scalacheck property in HashExpressionsSpec pins it anyway.
  */
// Serializable because codegen puts the module into the plan's references
// array (`addReferenceObj` in ShingleHash60Array.doGenCode), and any stage
// whose WholeStageCodegen factory is task-serialized writes that array out
// — a bare Scala object is NOT Serializable and fails the whole task
// (surfaced by q166 once the fused kernel sat inside a projection's WSC).
// The object is stateless (defs only), so serialization is a no-op tag.
object ShingleKernel extends Serializable {

  private def mdLocal = HashExpressions.mdLocal

  /** Null ARRAY input. Set mode → `[null]` — what the composite's
    * `array(array_join(null))` yields, so the row survives to a null hash;
    * positional mode → empty (the `otherwise(array())` branch).
    */
  def nullInput(positional: Boolean): ArrayData =
    if (positional) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(Array[Any](null))

  def run(arr: ArrayData, w: Int, positional: Boolean): ArrayData = {
    val n = arr.numElements()
    val md = mdLocal.get()
    // Null ELEMENTS are skipped exactly as array_join skips them (no token,
    // no separator) — the composite tolerated null tokens; the fused form
    // must too, not NPE (all current call sites feed TF.tokens, which is
    // null-free, but the kernel is a public helper).
    def windowString(start: Int, len: Int): String = {
      val sb = new java.lang.StringBuilder
      var appended = false
      var j = 0
      while (j < len) {
        if (!arr.isNullAt(start + j)) {
          if (appended) sb.append(' ')
          sb.append(arr.getUTF8String(start + j).toString)
          appended = true
        }
        j += 1
      }
      sb.toString
    }
    def h(s: String): Long =
      HashExpressions.hash60Bytes(md, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (positional) {
      if (n < w) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Long](n - w + 1)
      var i = 0
      while (i <= n - w) { out(i) = h(windowString(i, w)); i += 1 }
      new GenericArrayData(out)
    } else if (n < w) {
      new GenericArrayData(Array[Any](h(windowString(0, n))))
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= n - w) { seen.add(windowString(i, w)); i += 1 }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = h(it.next()); k += 1 }
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }
  }
}
