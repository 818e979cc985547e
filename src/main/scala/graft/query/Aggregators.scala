package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The scalar-aggregator registry (P1) — the Spark counterpart of the
 * reference's `NumericAggregatorFactory` plugin lookup
 * (AuraMetricsNumericArrayIterator.java:183-195): temporal aggregators
 * are resolved by name, the alias table (zimsum/mimmin/mimmax) is data,
 * and custom aggregators register at runtime instead of being wired into
 * a match statement.
 *
 * A registered aggregator receives (cleaned value column, order-by ts
 * column, interval seconds, reporting-interval seconds) and returns an
 * aggregate Column — so exotic plugins (percentiles, range, …) compose
 * with the engine's grouping exactly like built-ins, and stay inside
 * Catalyst (no UDAF objects, no interpreted paths).
 */
object Aggregators {

  /** (value, ts, intervalSec, reportingIntervalSec) → aggregate column. */
  type TemporalAgg = (Column, Column, Long, Option[Long]) => Column

  private val aliases: Map[String, String] =
    Map("zimsum" -> "sum", "mimmin" -> "min", "mimmax" -> "max")

  private val builtin: Map[String, TemporalAgg] = Map(
    "sum" -> ((v, _, _, _) => sum(v)),
    "avg" -> { (v, _, iv, rep) =>
      rep match {
        // "reporting average": sum / expected dps per interval
        // (reference :151-157, 506-511)
        case Some(r) => sum(v) / lit(iv.toDouble / r)
        case None => avg(v)
      }
    },
    "count" -> ((v, _, _, _) => count(v).cast("double")),
    "min" -> ((v, _, _, _) => min(v)),
    "max" -> ((v, _, _, _) => max(v)),
    // last non-null value by time order (reference :482,522-523)
    "last" -> ((v, ts, _, _) => max_by(v, when(v.isNotNull, ts))),
    // FIRST — the symmetric sibling in the upstream aggregator
    // vocabulary: first non-null value by time order
    "first" -> ((v, ts, _, _) => min_by(v, when(v.isNotNull, ts))),
    // DEV — upstream's standard-deviation aggregator (sample stddev)
    "dev" -> ((v, _, _, _) => stddev_samp(v)),
    "median" -> ((v, _, _, _) => percentile(v, lit(0.5))))

  private val custom =
    scala.collection.concurrent.TrieMap.empty[String, TemporalAgg]

  /** Register a plugin aggregator (e.g. `register("range", (v,_,_,_) =>
   *  max(v) - min(v))`). Last registration wins, like the reference's
   *  factory map. */
  def register(name: String, agg: TemporalAgg): Unit = custom.put(name, agg): Unit

  /** percentile plugin family pNN / pNN.N (NON_OPTIMIZED path) — one
   *  validation shared by [[resolve]] and [[isRegistered]] so the two
   *  never disagree on what counts as a percentile name. */
  private val PercentileName = """^p(100(?:\.0)?|\d{1,2}(?:\.\d)?)$""".r

  private def percentileQ(name: String): Option[Double] = name match {
    case PercentileName(n) => Some(n.toDouble / 100.0)
    case _ => None
  }

  def resolve(name: String): TemporalAgg = {
    val canonical = aliases.getOrElse(name, name)
    custom.get(canonical)
      .orElse(builtin.get(canonical))
      .orElse(percentileQ(canonical).map[TemporalAgg] { q =>
        (v, _, _, _) => percentile(v, lit(q))
      })
      .getOrElse(throw new IllegalArgumentException(s"unknown downsample agg: $name"))
  }

  def isRegistered(name: String): Boolean = {
    val c = aliases.getOrElse(name, name)
    custom.contains(c) || builtin.contains(c) || percentileQ(c).isDefined
  }
}
