package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The banded cumulative-sum discipline, extracted once.
  *
  * A global running sum / global rank over a corpus-sized frame is the
  * classic Spark scale trap: `Window.orderBy(x)` with no partition key
  * funnels every row through ONE task. The banded spelling keeps the
  * same exact semantics at full parallelism when the ordering key can be
  * bucketed monotonically (band = key div W):
  *
  *   1. one shuffle to band grain for per-band totals (the band table is
  *      metadata-sized — key-domain/W rows, or per (part, band));
  *   2. cross-band exclusive-prefix offsets + optional grand totals,
  *      computed by windows over THAT table and broadcast back;
  *   3. within-band running sums under `partitionBy(part :+ band)` —
  *      parallel across bands, each band a bounded slice of the domain.
  *
  * offset(band) + within-band running sum == the global running sum, by
  * associativity, for any row order that sorts band-monotonically —
  * which `band = key div W` guarantees for any order prefixed by `key`.
  *
  * Used by the corpus quality-budget cut (q117), latency percentiles
  * (q193), per-type value ranks (q209/q228), the exact KS statistic
  * (q237), and equi-depth binning (q240); each site's scaladoc carries
  * its own band-width reasoning. A rank is the cumulative sum of 1
  * (`summand = lit(1L)`), so ranks and sums share this one combinator.
  */
object Banded {

  /** One cumulative measure: `out` = global running sum of `summand`
    * (inclusive of the current row); `total`, when set, additionally
    * emits the per-partition grand total of `summand` under that name.
    */
  final case class CumSpec(out: String, summand: Column,
      total: Option[String] = None)

  /** Internal helper-column prefix. Namespaced so caller columns can
    * never collide silently; [[cumSums]] additionally ASSERTS no input
    * column starts with it (an input produced by a previous cumSums has
    * had its helpers dropped, so chaining stays legal).
    */
  private val P = "__graft_banded_"

  /** Append to `df` every [[CumSpec]]'s cumulative (and optional total)
    * column. `order` is the within-band row order — it must start with
    * the banded key (same direction as `bandDesc`) so band order extends
    * row order; ties should be broken to a total order for deterministic
    * cumulatives. All internal helper columns (the band bucket, per-band
    * totals, cross-band offsets) use the [[P]] namespace and are dropped
    * before returning — a caller's own `band` column passes through
    * untouched, and the output schema is exactly input ++ spec outputs.
    */
  def cumSums(df: DataFrame, part: Seq[String], order: Seq[Column],
      band: Column, specs: Seq[CumSpec],
      bandDesc: Boolean = false): DataFrame = {
    val colliding = df.columns.filter(_.startsWith(P))
    require(colliding.isEmpty,
      s"cumSums input already has internal columns: ${colliding.mkString(", ")}")
    val reserved = specs.flatMap(sp => sp.out +: sp.total.toSeq)
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"cumSums output name(s) already in input: ${reserved.mkString(", ")}")
    val bandCol = s"${P}band"
    val b = df.withColumn(bandCol, band)
    val partBand = part :+ bandCol
    val bandAggs = specs.map(sp => sum(sp.summand).as(s"${P}bt_${sp.out}"))
    val bc = b.groupBy(partBand.map(col): _*)
      .agg(bandAggs.head, bandAggs.tail: _*)
    val bandOrd = if (bandDesc) col(bandCol).desc else col(bandCol).asc
    val wOff = (if (part.isEmpty) Window.orderBy(bandOrd)
      else Window.partitionBy(part.map(col): _*).orderBy(bandOrd))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = if (part.isEmpty) Window.partitionBy()
      else Window.partitionBy(part.map(col): _*)
    val offs0 = specs.foldLeft(bc) { (d, sp) =>
      val d1 = d.withColumn(s"${P}off_${sp.out}",
        coalesce(sum(col(s"${P}bt_${sp.out}")).over(wOff), lit(0L)))
      sp.total.fold(d1)(tn =>
        d1.withColumn(tn, sum(col(s"${P}bt_${sp.out}")).over(wTot)))
    }
    val keep = partBand ++ specs.map(sp => s"${P}off_${sp.out}") ++
      specs.flatMap(_.total)
    val offs = offs0.select(keep.map(col): _*)
    val wB = Window.partitionBy(partBand.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    specs.foldLeft(b.join(broadcast(offs), partBand)) { (d, sp) =>
      d.withColumn(sp.out, col(s"${P}off_${sp.out}") + sum(sp.summand).over(wB))
    }.drop(bandCol +: specs.map(sp => s"${P}off_${sp.out}"): _*)
  }
}
