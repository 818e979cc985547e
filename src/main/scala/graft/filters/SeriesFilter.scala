package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The query filter language — a direct model of the reference's filter IR
 * (reference core/meta/Filter.java tree, built from OpenTSDB query JSON by
 * QueryBuilderTSDBExt.java:48-122), compiled here to a Catalyst boolean
 * `Column` over (`metric: STRING`, `tags: MAP<STRING,STRING>`).
 *
 * Compiling to a plain Column (instead of an index structure) lets
 * Catalyst push the predicate into the parquet scan and prune partitions —
 * the Spark-native analog of the reference's RoaringBitmap inverted index
 * (NewDocStore.java:779-828).
 */
sealed trait SeriesFilter {
  /** Distinct tag keys referenced by positive terms — used by the
   *  explicit-tags check (reference QueryBuilderTSDBExt.java:52-56). */
  def tagKeys: Set[String]
}

/** Tag value ∈ literal set (reference core/meta/LiteralFilter.java:24-43). */
final case class TagLiteral(key: String, values: Seq[String]) extends SeriesFilter {
  def tagKeys: Set[String] = Set(key)
}

/** Tag value matches regex with *contains* (Matcher.find) semantics
 *  (reference RegexpFilter.java:21-36). `.*` short-circuits to match-all
 *  (reference Filter.java:55-66 `matches_all`). */
final case class TagRegexp(key: String, regex: String) extends SeriesFilter {
  def tagKeys: Set[String] = Set(key)
}

/** Glob: `*` rewritten to `.*` at plan time
 *  (reference QueryBuilderTSDBExt.java:105-114). */
final case class TagWildcard(key: String, pattern: String) extends SeriesFilter {
  def tagKeys: Set[String] = Set(key)
}

/** Metric name literal set or regex (reference core/meta/MetricFilter.java:30-65). */
final case class MetricLiteral(names: Seq[String]) extends SeriesFilter {
  def tagKeys: Set[String] = Set.empty
}
final case class MetricRegexp(regex: String) extends SeriesFilter {
  def tagKeys: Set[String] = Set.empty
}

/** Presence / regex match of a tag **key** (reference TagKeyFilter.java:28-63). */
final case class TagKeyLiteral(keys: Seq[String]) extends SeriesFilter {
  def tagKeys: Set[String] = keys.toSet
}
final case class TagKeyRegexp(regex: String) extends SeriesFilter {
  def tagKeys: Set[String] = Set.empty
}

/** Regex match against any tag key or value (reference AnyFilter.java:27-62). */
final case class AnyMatch(regex: String) extends SeriesFilter {
  def tagKeys: Set[String] = Set.empty
}

/** Boolean combiner (reference ChainFilter.java:78-110). */
final case class Chain(op: Chain.Op, members: Seq[SeriesFilter]) extends SeriesFilter {
  def tagKeys: Set[String] = members.flatMap(_.tagKeys).toSet
}
object Chain {
  sealed trait Op
  case object And extends Op
  case object Or extends Op
  def and(members: SeriesFilter*): Chain = Chain(And, members)
  def or(members: SeriesFilter*): Chain = Chain(Or, members)
}

/** Negation. Pure-NOT queries are legal: the reference normalizes them to
 *  `MATCH_ALL andNot f` (MetaQueryBuilder.java:116-124); in boolean algebra
 *  that is just `!f`, which Catalyst's BooleanSimplification handles. */
final case class Not(f: SeriesFilter) extends SeriesFilter {
  def tagKeys: Set[String] = Set.empty // negative terms don't count for explicit-tags
}

/** Matches everything (reference MatchAllFilter.java:25-60). */
case object MatchAll extends SeriesFilter {
  def tagKeys: Set[String] = Set.empty
}

object SeriesFilter {
  /** `*` glob → regex (reference QueryBuilderTSDBExt.java:107-108). */
  def globToRegex(glob: String): String = glob.replace("*", ".*")

  private def isMatchAllRegex(re: String): Boolean = re == ".*" || re == "^.*$"

  /** Compile a filter tree to a boolean Column over (metric, tags). */
  def compile(f: SeriesFilter, metric: Column, tags: Column): Column = f match {
    case TagLiteral(k, vs) =>
      if (vs.size == 1) tags(k) === vs.head else tags(k).isin(vs: _*)
    case TagRegexp(k, re) =>
      if (isMatchAllRegex(re)) lit(true) // reference matches_all fast path
      else tags(k).rlike(re) // rlike = Matcher.find, matching the reference
    case TagWildcard(k, pat) =>
      compile(TagRegexp(k, globToRegex(pat)), metric, tags)
    case MetricLiteral(names) =>
      if (names.size == 1) metric === names.head else metric.isin(names: _*)
    case MetricRegexp(re) =>
      if (isMatchAllRegex(re)) lit(true) else metric.rlike(re)
    case TagKeyLiteral(keys) =>
      keys.map(k => map_contains_key(tags, lit(k))).reduce(_ && _)
    case TagKeyRegexp(re) =>
      exists(map_keys(tags), _.rlike(re))
    case AnyMatch(re) =>
      exists(map_keys(tags), _.rlike(re)) || exists(map_values(tags), _.rlike(re))
    case Chain(Chain.And, ms) =>
      ms.map(compile(_, metric, tags)).reduceOption(_ && _).getOrElse(lit(true))
    case Chain(Chain.Or, ms) =>
      ms.map(compile(_, metric, tags)).reduceOption(_ || _).getOrElse(lit(false))
    // Null-safe negation: for a series missing the tag key, the inner
    // predicate is NULL; the reference's bitmap andNot treats such series
    // as matching the NOT (NewDocStore.java:1030,1135), so NULL ⇒ false
    // before negating.
    case Not(inner) => !coalesce(compile(inner, metric, tags), lit(false))
    case MatchAll => lit(true)
  }

  /** Explicit-tags conjunct: series qualifies only if its tag count equals
   *  the filter's distinct positive tag-key count
   *  (reference TimeSeriesShard.java:718-732). */
  def explicitTagsPredicate(f: SeriesFilter, tags: Column): Column =
    size(map_keys(tags)) === lit(f.tagKeys.size)
}
