package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-integrity guards: the driver contract's invariants, pinned so
  * they cannot silently regress. */
class CatalogSpec extends AnyFunSuite {

  test("every catalog query carries an exact oracle (100% coverage stays 100%)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o,
      s"queries without oracle: ${(q -- o).toSeq.sorted}; oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("no query name is shadowed across the merged catalog maps") {
    import graft.queries.{LlmQueries, ReferenceQueries, RelationalQueries, StreamingQueries}
    val parts = Seq(
      ReferenceQueries.defs.keySet, RelationalQueries.defs.keySet,
      LlmQueries.defs.keySet, StreamingQueries.defs.keySet)
    val total = parts.map(_.size).sum
    assert(total == SparkEntry.queries.size,
      s"duplicate keys across query maps: ${parts.flatten.groupBy(identity).collect { case (k, v) if v.size > 1 => k }}")
    val oparts = Seq(
      ReferenceQueries.oracles.keySet, RelationalQueries.oracles.keySet,
      LlmQueries.oracles.keySet, StreamingQueries.oracles.keySet)
    assert(oparts.map(_.size).sum == SparkEntry.oracleSql.size,
      "duplicate keys across oracle maps")
  }

  test("every oracle is non-empty SQL with a deterministic row order") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      val up = sql.trim.toUpperCase
      val tail = up.linesIterator.toSeq.takeRight(2).mkString(" ")
      // whole-frame folds aggregate to exactly ONE row — order-free by
      // construction (explicit list, so a new unordered multi-row oracle
      // can't silently ride the exemption)
      val singleRow = Set("fold_sum_extra_args", "fold_longest_streak", "fold_multi_in_out")
      assert(tail.contains("ORDER BY") || tail.contains("LIMIT") || singleRow(name),
        s"$name: oracle must end with a deterministic ORDER BY/LIMIT, got ...$tail")
    }
  }
}
