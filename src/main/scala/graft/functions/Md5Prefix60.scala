package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, col, concat_ws, conv, lit, md5, substring}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the repo's portable 60-bit content hash
  * — the value of `conv(substring(md5(CAST(x AS STRING)), 1, 15), 16, 10)
  * ::long`, which ~20 catalog queries use for deterministic bucketing,
  * sampling, folds, bootstrap uniforms, KMV sketches, and n-gram
  * fingerprints (it is the repo's cross-engine replacement for `rand()`
  * and `xxhash64`).
  *
  * The built-in chain materializes a 32-char lowercase hex UTF8String,
  * substrings it, then string-parses base-16 — three intermediate strings
  * per row. This expression digests the UTF8 bytes once (thread-cached
  * MessageDigest — the built-in allocates a fresh digest per row) and
  * assembles the SAME 60-bit value directly from the first 7½ digest
  * bytes. Bit-identical by construction (first 15 hex chars == first 7
  * bytes and the high nibble of byte 8, big-endian); Md5Prefix60Spec
  * asserts exact equality against the SQL chain, and every consuming
  * query's DuckDB oracle — which still spells the md5 chain in SQL —
  * re-proves it per gate.
  *
  * Charter preference (b): custom Expression with doGenCode, inside
  * whole-stage codegen, before any UDF.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | org.apache.spark.sql.types.NullType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_md5_60 expects a string input, got $t")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes of `s`), big-endian — the value the
    * 15-hex-char `conv` chain parses. Called from generated code.
    */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Idempotent session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5_60", exprs => Md5Prefix60(exprs.head), "built-in")

  // sessions seen by ensureRegistered — avoids re-registering on every
  // Column construction (builders call the helpers per query)
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** The 60-bit content hash of `key` (cast to string first, matching the
    * portable SQL spelling). Uses the native expression when an active
    * session is available to resolve it; falls back to the built-in chain
    * otherwise — both produce identical values.
    */
  def md5Prefix60(key: Column): Column =
    SparkSession.getActiveSession match {
      case Some(s) =>
        if (registered.add(s)) register(s)
        call_function("graft_md5_60", key.cast("string"))
      case None =>
        conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    }

  /** [[md5Prefix60]] over several columns joined with `#` — the composite
    * row-key spelling (`concat_ws('#', …)`) several queries hash.
    */
  def md5Prefix60(keys: Seq[Column]): Column =
    md5Prefix60(concat_ws("#", keys: _*))
}
