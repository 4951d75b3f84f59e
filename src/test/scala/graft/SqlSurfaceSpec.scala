package graft

import org.apache.spark.sql.functions._

import graft.sql.SqlFunctions
import graft.text.{TextFunctions => TF}

/** The SQL surface must be indistinguishable from the Column API: every
  * graft_* SQL function is compared against its Column twin on the real
  * documents/embeddings tables, exact equality (these are deterministic
  * expressions — any mismatch is a spelling divergence, not noise).
  */
class SqlSurfaceSpec extends SparkSpec {

  private lazy val registered: Unit = {
    SqlFunctions.register(spark)
    SqlFunctions.registerTables(spark, sfDir)
  }

  test("text functions: SQL spelling == Column API on the documents table") {
    registered
    val viaSql = spark.sql(
      """SELECT doc_id, graft_tokens(text) AS toks, graft_normalize(text) AS norm,
        |       graft_fingerprint(text) AS fp, graft_token_count(text) AS n_toks,
        |       graft_word_bigrams(graft_tokens(text)) AS bigrams,
        |       graft_char_ngrams(text, 3) AS ngrams,
        |       graft_langid(text) AS lang
        |FROM documents""".stripMargin)
    val viaCol = Tables.documents(spark, sfDir).select(
      col("doc_id"), TF.tokens(col("text")).as("toks"),
      TF.normalizeText(col("text")).as("norm"),
      md5(TF.normalizeText(col("text"))).as("fp"),
      size(TF.tokens(col("text"))).as("n_toks"),
      TF.wordBigrams(TF.tokens(col("text"))).as("bigrams"),
      TF.charNgrams(col("text"), 3).as("ngrams"),
      TF.langPredict(TF.tokens(col("text"))).as("lang"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty,
      "SQL text surface diverges from the Column API")
  }

  test("graft_quality == q24's quality_score column") {
    registered
    val viaSql = spark.sql(
      "SELECT doc_id, graft_quality(text) AS quality_score FROM documents")
    val q24 = SparkEntry.queries("q24_quality_score")(spark, sfDir)
      .select("doc_id", "quality_score")
    assert(viaSql.exceptAll(q24).isEmpty && q24.exceptAll(viaSql).isEmpty,
      "graft_quality diverges from q24")
  }

  test("graft_cosine == Ann.cosine (native-dot body when extensions are on)") {
    registered
    // The test session runs GraftExtensions, so the registered body must be
    // the native graft_dot one.
    assert(spark.catalog.functionExists("graft_dot"))
    val viaSql = spark.sql(
      """SELECT a.vec_id AS qa, b.vec_id AS qb,
        |       graft_cosine(cast(a.embedding AS ARRAY<DOUBLE>),
        |                    cast(b.embedding AS ARRAY<DOUBLE>)) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id AND b.vec_id <= 20""".stripMargin)
    val e = Tables.embeddings(spark, sfDir)
    val viaCol = e.alias("a").join(e.alias("b"),
        col("a.vec_id") < col("b.vec_id") && col("b.vec_id") <= 20)
      .select(col("a.vec_id").as("qa"), col("b.vec_id").as("qb"),
        graft.sim.Ann.cosine(
          graft.sim.Ann.toDouble(col("a.embedding")),
          graft.sim.Ann.toDouble(col("b.embedding"))).as("cos"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty,
      "graft_cosine diverges from Ann.cosine")
  }

  test("SQL UDFs inline: no eval boundary in the physical plan") {
    registered
    val plan = spark.sql(
        "SELECT graft_quality(text) AS q FROM documents WHERE graft_langid(text) = 'en'")
      .queryExecution.executedPlan.toString
    // Inlined bodies show up as raw expressions (the regexes, the CASE) —
    // a black-box boundary would instead appear as a ScalaUDF/Invoke node
    // hiding the body from the optimizer. (The HOF lambdas inside keep the
    // stage out of whole-stage codegen in BOTH the SQL and Column
    // spellings; inlining is the property this surface adds.)
    assert(!plan.contains("ScalaUDF") && !plan.contains("Invoke"), plan.take(2000))
    assert(plan.contains("regexp_replace(text") && plan.contains("CASE WHEN"),
      "function bodies were not inlined:\n" + plan.take(2000))
  }
}
