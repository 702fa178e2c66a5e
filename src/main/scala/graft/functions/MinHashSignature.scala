package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}

/** MinHash signature as a single declarative aggregate: one buffer
  * holds all `nHashes` running minima of the salted-md5 hex strings
  * (hex order ≡ numeric order of the 128-bit hash, so string `Least`
  * is the correct min).
  *
  * `DeclarativeAggregate` means every phase — init, per-row update,
  * partial merge, final evaluate — is a pure Catalyst expression, so
  * the aggregate participates in whole-stage codegen and map-side
  * partial aggregation like a built-in: the extension path for custom
  * aggregation semantics without an ImperativeAggregate's per-row
  * virtual calls.
  */
case class MinHashSignature(child: Expression, nHashes: Int)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_signature"

  private lazy val minima: Seq[AttributeReference] =
    (0 until nHashes).map(i => AttributeReference(s"minh$i", StringType)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = minima

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(nHashes)(Literal(null, StringType))

  private def saltedHash(i: Int): Expression =
    Md5(Cast(Concat(Seq(Literal(s"$i:"), child)), BinaryType))

  // Least skips nulls: a null buffer takes the first hash, a null
  // input row leaves the buffer unchanged.
  override lazy val updateExpressions: Seq[Expression] =
    (0 until nHashes).map(i => Least(Seq(minima(i), saltedHash(i))))

  override lazy val mergeExpressions: Seq[Expression] =
    (0 until nHashes).map(i => Least(Seq(minima(i).left, minima(i).right)))

  override lazy val evaluateExpression: Expression = CreateArray(minima)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashSignature {
  private val name = "graft_minhash_signature"

  def register(spark: SparkSession, nHashes: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => MinHashSignature(exprs.head, nHashes).toAggregateExpression(),
      "built-in")

  /** Aggregate Column: array of `nHashes` minhash hex strings. */
  def apply(spark: SparkSession, c: Column, nHashes: Int): Column = {
    register(spark, nHashes)
    call_function(name, c)
  }
}
