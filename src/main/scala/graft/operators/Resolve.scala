package graft.operators

import graft.filters.SeriesFilter
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hash → string resolution and meta-group joins.
 *
 * J3: the reference resolves series/tag hashes to display strings via the
 * Myst dictionary (DefaultMetaTimeSeriesQueryResult.java:86-89,
 * MergedMetaTimeSeriesQueryResult.java:37-95). Spark-side the dictionary
 * is the series_dim table and resolution is a broadcast equi-join on
 * series_id.
 *
 * J4: the batch path joins meta-resolved series groups against fact
 * segments per group (AerospikeBatchQueryNode.java:246-380,
 * AerospikeBatchJob keying). Spark-side: filter the dimension, attach
 * group keys, broadcast-join the fact, aggregate per group — one
 * broadcast, one shuffle keyed by the group columns.
 */
object Resolve {

  /** J3: attach metric/tags display strings to a series_id-keyed frame. */
  def resolveSeries(df: DataFrame, seriesDim: DataFrame): DataFrame =
    df.join(broadcast(seriesDim.select("series_id", "metric", "tags")), Seq("series_id"))

  /** J4: meta-resolved groups × fact. Returns the fact rows of matching
   *  series with one `g_<key>` column per requested group key. */
  def groupsFactJoin(fact: DataFrame, seriesDim: DataFrame, f: SeriesFilter,
      groupKeys: Seq[String]): DataFrame = {
    val pred: Column = SeriesFilter.compile(f, col("metric"), col("tags"))
    val groups = seriesDim.filter(pred)
      .select(col("series_id") +: groupKeys.map(k => col("tags")(k).as(s"g_$k")): _*)
    fact.drop("metric", "tags").join(broadcast(groups), Seq("series_id"))
  }
}
