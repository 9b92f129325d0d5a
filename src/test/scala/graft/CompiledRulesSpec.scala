package graft

import org.apache.spark.sql.functions._
import graft.data.DocGen
import graft.engine.Validate

/** The compiled SpanViolations expression must be indistinguishable from
  * the declarative Column-algebra rule corpus on the full injected-violation
  * dataset (every rule class fires somewhere at sf0.001). */
class CompiledRulesSpec extends SparkSpec {

  test("compiled rule corpus == declarative rule corpus (violations)") {
    val catalog = DocGen.mediaCatalogMap(spark, sf)
    val docs = DocGen.docs(spark, sf)
    val compiled = Validate.withViolations(docs, catalog)
      .select("doc_id", "violations")
    val declarative = Validate.withViolationsDeclarative(docs, catalog)
      .select("doc_id", "violations")
    assert(compiled.count() == declarative.count())
    assert(compiled.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(compiled).isEmpty)
    // and at least one of every severity fired somewhere
    val sevs = Validate.violations(docs, catalog)
      .select("severity").distinct().collect().map(_.getString(0)).toSet
    assert(sevs == Set("info", "warning", "error", "fatal"))
  }

  test("compiled corpus handles typed edge docs identically") {
    import spark.implicits._
    val edge = Seq(
      graft.model.Doc("e1", Seq.empty),
      graft.model.Doc("e2", Seq(graft.model.Span(None, None, None, 0))),
      graft.model.Doc("e3", Seq(
        graft.model.Span(Some("text"), Some("0"), None, 0),
        graft.model.Span(Some("text"), Some("0"), None, 0))),
      graft.model.Doc("e4", (1 to 9).map(i =>
        graft.model.Span(Some("media"), None, Some("m1"), i)))
    ).toDS().toDF()
    val catalog = Map("m1" -> "image")
    val a = Validate.withViolations(edge, catalog).select("doc_id", "violations")
    val b = Validate.withViolationsDeclarative(edge, catalog).select("doc_id", "violations")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
