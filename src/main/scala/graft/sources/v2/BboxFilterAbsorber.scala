package graft.sources.v2

import graft.geom.Envelope
import org.apache.spark.sql.sources._

/** Shared Catalyst-filter -> query-rect absorption for the container
  * sources (geomedea + flatgeobuf): filters over the four envelope stat
  * columns tighten a closed-interval query rect that is a strict
  * SUPERSET of the predicate (a row's max >= min, so `min_lng >= v`
  * also implies `max_lng >= v` — the intersection test's left bound;
  * symmetrically for the other three). And() recurses; anything else is
  * left to Spark. Callers keep EVERY filter residual: the rect only
  * prunes, correctness never depends on it.
  */
final class BboxFilterAbsorber {
  private var qMinLng = Int.MinValue
  private var qMinLat = Int.MinValue
  private var qMaxLng = Int.MaxValue
  private var qMaxLat = Int.MaxValue

  private def asInt(v: Any): Option[Int] = v match {
    case n: java.lang.Number =>
      val l = n.longValue()
      Some(math.max(Int.MinValue.toLong, math.min(Int.MaxValue.toLong, l)).toInt)
    case _ => None
  }

  /** True when the filter tightened the rect (see class doc). */
  def absorb(f: Filter): Boolean = f match {
    case And(l, r) =>
      val a = absorb(l); val b = absorb(r); a || b
    case GreaterThanOrEqual(c, v) => lower(c, v)
    case GreaterThan(c, v)        => lower(c, v)
    case LessThanOrEqual(c, v)    => upper(c, v)
    case LessThan(c, v)           => upper(c, v)
    case EqualTo(c, v)            => val a = lower(c, v); val b = upper(c, v); a || b
    case _                        => false
  }

  private def lower(col: String, v: Any): Boolean = asInt(v) match {
    case Some(i) => col match {
      case "max_lng" | "min_lng" => qMinLng = math.max(qMinLng, i); true
      case "max_lat" | "min_lat" => qMinLat = math.max(qMinLat, i); true
      case _                     => false
    }
    case None => false
  }

  private def upper(col: String, v: Any): Boolean = asInt(v) match {
    case Some(i) => col match {
      case "min_lng" | "max_lng" => qMaxLng = math.min(qMaxLng, i); true
      case "min_lat" | "max_lat" => qMaxLat = math.min(qMaxLat, i); true
      case _                     => false
    }
    case None => false
  }

  /** Tighten the rect from an explicit source (the `bbox` read option);
    * composes with absorbed filters by intersection, like any bound.
    */
  def seed(e: Envelope): Unit = {
    qMinLng = math.max(qMinLng, e.minLng); qMinLat = math.max(qMinLat, e.minLat)
    qMaxLng = math.min(qMaxLng, e.maxLng); qMaxLat = math.min(qMaxLat, e.maxLat)
  }

  /** The absorbed rect, or None when nothing tightened it. */
  def bbox: Option[Envelope] =
    if (qMinLng == Int.MinValue && qMinLat == Int.MinValue &&
      qMaxLng == Int.MaxValue && qMaxLat == Int.MaxValue) None
    else Some(Envelope(qMinLng, qMinLat, math.max(qMinLng, qMaxLng), math.max(qMinLat, qMaxLat)))
}

object BboxFilterAbsorber {
  /** The explicit `bbox` read option: `"minLng,minLat,maxLng,maxLat"` in
    * the engine's scaled 1e-7-degree ints. This is the ONLY channel a
    * STREAMING scan has for the rect — Spark's MicroBatchExecution builds
    * the scan straight off `newScanBuilder(options).build()` and never
    * calls pushFilters (verified against the Spark 4.1 bytecode: no
    * PushDownUtils in MicroBatchExecution) — so `readStream.option
    * ("bbox", ...)` is how a tailing query gets planning-time shard
    * pruning + ranged index reads. Batch reads may pass it too; it
    * intersects with whatever the WHERE-clause absorber tightens.
    * Semantics match the reference's bbox query: the scan emits exactly
    * the features whose envelope intersects the rect (closed intervals).
    */
  def fromOptions(options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
  : Option[Envelope] =
    Option(options.get("bbox")).map { s =>
      val p = s.split(',')
      require(p.length == 4,
        s"bbox option must be 'minLng,minLat,maxLng,maxLat' (scaled 1e-7 deg ints); got '$s'")
      val v = p.map(_.trim.toInt)
      require(v(0) <= v(2) && v(1) <= v(3), s"bbox option has min > max: '$s'")
      Envelope(v(0), v(1), v(2), v(3))
    }
}
