package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Modified-Dietz portfolio return — the family-tool calculation the
  * reference README points at (SURVEY §4 item 2): return over a period
  * with external cash flows, each flow weighted by the fraction of the
  * period it was invested:
  *
  *   R = (EMV − BMV − ΣCF) / (BMV + Σ wᵢ·CFᵢ),   wᵢ = remaining-days(tᵢ)/T
  *
  * Genuinely one-pass (not expressible as a single built-in aggregate):
  * a typed `Aggregator` folds (flow, weight) pairs into two partial sums
  * with map-side combine, so the shuffle carries 16 bytes per group
  * regardless of flow count — the right shape at 100 TB.
  *
  * This engine-level formulation takes EMV = BMV + gainRate·ΣCF (a
  * deterministic valuation model supplied by the caller), making the
  * result oracle-checkable while keeping the weighted-denominator fold
  * the real work.
  */
final case class DietzBuf(sumCf: Double, sumWCf: Double)

class ModifiedDietz(bmv: Double, gainRate: Double)
    extends Aggregator[(Double, Double), DietzBuf, Double] {
  override def zero: DietzBuf = DietzBuf(0.0, 0.0)
  override def reduce(b: DietzBuf, in: (Double, Double)): DietzBuf =
    DietzBuf(b.sumCf + in._1, b.sumWCf + in._1 * in._2)
  override def merge(a: DietzBuf, b: DietzBuf): DietzBuf =
    DietzBuf(a.sumCf + b.sumCf, a.sumWCf + b.sumWCf)
  override def finish(b: DietzBuf): Double =
    gainRate * b.sumCf / (bmv + b.sumWCf)
  override def bufferEncoder: Encoder[DietzBuf] = Encoders.product[DietzBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
