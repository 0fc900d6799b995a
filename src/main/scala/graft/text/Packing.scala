package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.SequenceOps

/** Sequence packing for training-batch construction (builder brief):
  * assign documents, in a deterministic order, to fixed token-budget bins
  * — the step that turns a curated corpus into the contiguous training
  * sequences a data loader consumes.
  *
  * Semantics: contiguous fill. Documents are laid end-to-end in
  * (`orderCol`) order and the token stream is cut every `budget` tokens; a
  * document belongs to the bin where its FIRST token falls, so a bin can
  * overflow by at most the tail of one straddling document. This is the
  * associative formulation — bin(d) is a pure function of the exclusive
  * running token sum — which is what makes it distributable and
  * engine-replayable. (True first-fit "open a new bin when the next doc
  * would overflow" is inherently sequential: each decision depends on the
  * previous bin's residue, a non-associative fold no engine parallelizes.)
  *
  * Scale design: the running sum is plans.SequenceOps.runningSum — range
  * partitioned, parallelism = #partitions even though the order is GLOBAL
  * (a plain `Window.orderBy` would funnel the whole corpus through one
  * task). Everything else is a projection.
  */
object Packing {

  /** Append `bin` (0-based) to `docs`: contiguous fill of `budget` tokens
    * per bin in `orderCol` order. `tokensCol` must be a non-negative
    * integral column.
    */
  def contiguousBins(docs: DataFrame, orderCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    SequenceOps.runningSum(docs, Seq.empty, Seq(orderCol), tokensCol, "__cum")
      .withColumn("bin",
        expr(s"(__cum - $tokensCol) div $budget"))
      .drop("__cum")
  }
}
