package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** [[TextAnalysis.htmlExtract]] — strip/count semantics replayed in
  * plain Scala, plus the zero-guards on degenerate input. */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(html: String): String =
    html.replaceAll("<[^>]*>", " ").replaceAll(" +", " ").trim

  test("extraction replays in plain Scala on crafted pages") {
    val pages = Seq(
      (1L, """<html><body><p>Hello world.</p><a href="/x">link text</a></body></html>"""),
      (2L, """<div>No links here at all</div>"""),
      (3L, """<a href="/a">one</a><a href="/b">two</a> tail"""))
    val got = TextAnalysis.htmlExtract(pages.toDF("doc_id", "page"), "doc_id", "page")
      .orderBy("id").collect()
    pages.zip(got).foreach { case ((id, page), r) =>
      val text = strip(page)
      assert(r.getLong(0) === id)
      assert(r.getString(1) === text, s"doc $id text")
      assert(r.getLong(2) === "<[^>]*>".r.findAllIn(page).length, s"doc $id tags")
      val linkChars = "<a [^>]*>([^<]*)</a>".r.findAllMatchIn(page).map(_.group(1).length).sum
      assert(r.getLong(5) === linkChars.toLong, s"doc $id link chars")
      assert(r.getLong(6) === (if (text.isEmpty) 0L else linkChars.toLong * 1000000L / text.length),
        s"doc $id density")
    }
  }

  test("empty and tag-only pages report zeros instead of crashing") {
    val got = TextAnalysis.htmlExtract(
        Seq((1L, ""), (2L, "<br><hr>")).toDF("doc_id", "page"), "doc_id", "page")
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.getString(1) === "")
      assert(r.getLong(4) === 0L) // text_chars
      assert(r.getLong(6) === 0L) // link_density_ppm guard
    }
    assert(got(1).getLong(2) === 2L) // the two tags still counted
  }

  test("nav-heavy docs show strictly higher link density on the fixture wrapping") {
    val d = graft.queries.Tables(spark, TestSpark.sfDir, "documents")
    val page = concat(
      lit("<html><body><p>"), regexp_replace(col("text"), "\\. ", ".</p><p>"),
      lit("</p><a href=\"/d\">more</a>"),
      when(col("doc_id") % 3 === 0, lit("<a href=\"/nav\">nav nav nav</a>")).otherwise(lit("")),
      lit("</body></html>"))
    val r = TextAnalysis.htmlExtract(d.select(col("doc_id"), page.as("page")), "doc_id", "page")
      .withColumn("is_nav", (col("id") % 3 === 0))
      .groupBy("is_nav").agg(avg("link_density_ppm").as("d"))
      .collect().map(x => x.getBoolean(0) -> x.getDouble(1)).toMap
    assert(r(true) > r(false), s"nav docs must carry more anchor mass: $r")
  }
}
