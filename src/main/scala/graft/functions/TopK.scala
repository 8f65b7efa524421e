package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Input row for [[TopKByValue]]: a (value, key) pair ranked by
  * (value DESC, key ASC) — key doubles as the deterministic tie-break.
  */
final case class ValKey(value: Double, key: Long)

/** Bounded top-k aggregate: keeps at most `k` (value, key) pairs, ordered by
  * value DESC then key ASC.
  *
  * This is the scale path for "top-k per group" when the group cardinality is
  * low (e.g. 25 nations): a window rank would sort every row of a group
  * inside one task (parallelism ceiling = #groups). As an [[Aggregator]] it
  * participates in partial aggregation — every map task keeps ≤k rows per
  * group, the shuffle moves ≤k·partitions candidate rows per group, and the
  * final merge is O(k²·partitions). State is strictly bounded; works at any
  * scale factor.
  */
final class TopKByValue(k: Int)
    extends Aggregator[ValKey, Seq[ValKey], Seq[ValKey]] {

  private val ord: Ordering[ValKey] =
    Ordering.by[ValKey, (Double, Long)](v => (-v.value, v.key))

  private def bounded(s: Seq[ValKey]): Seq[ValKey] = s.sorted(ord).take(k)

  override def zero: Seq[ValKey] = Nil
  override def reduce(b: Seq[ValKey], a: ValKey): Seq[ValKey] = bounded(b :+ a)
  override def merge(b1: Seq[ValKey], b2: Seq[ValKey]): Seq[ValKey] =
    bounded(b1 ++ b2)
  override def finish(r: Seq[ValKey]): Seq[ValKey] = r
  override def bufferEncoder: Encoder[Seq[ValKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ValKey]]()
  override def outputEncoder: Encoder[Seq[ValKey]] = bufferEncoder
}

/** Input row for [[TopTermsByScore]]: a scored term with its counts,
  * ranked by (score DESC, token ASC) — the token string is the
  * deterministic tie-break (q127's ORDER BY).
  */
final case class TermScore(score: Double, token: String, tf: Long, df: Long)

/** Bounded top-k terms per document — [[TopKByValue]]'s pattern with a
  * string tie-break and the tf/df payload carried through. Map tasks keep
  * ≤k terms per doc, so the per-doc reduction happens BEFORE the shuffle
  * when a document's terms are co-located (they are, when the scored
  * stream keeps scan order), and the final merge is O(k²·partials).
  */
final class TopTermsByScore(k: Int)
    extends Aggregator[TermScore, Seq[TermScore], Seq[TermScore]] {

  private val ord: Ordering[TermScore] =
    Ordering.by[TermScore, (Double, String)](t => (-t.score, t.token))

  private def bounded(s: Seq[TermScore]): Seq[TermScore] = s.sorted(ord).take(k)

  override def zero: Seq[TermScore] = Nil
  override def reduce(b: Seq[TermScore], a: TermScore): Seq[TermScore] =
    bounded(b :+ a)
  override def merge(b1: Seq[TermScore], b2: Seq[TermScore]): Seq[TermScore] =
    bounded(b1 ++ b2)
  override def finish(r: Seq[TermScore]): Seq[TermScore] = r
  override def bufferEncoder: Encoder[Seq[TermScore]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TermScore]]()
  override def outputEncoder: Encoder[Seq[TermScore]] = bufferEncoder
}
