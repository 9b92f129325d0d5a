package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Deterministic derivation of the interleaved docs table
  * (`doc_id:string, spans:array<struct<kind,text,media_ref,offset>>`)
  * from the driver's read-only lineitem parquet, with targeted
  * invalidations on fixed modulus predicates — the Spark analog of the
  * reference's generator + `Invalidators` round-trip test pattern
  * (/root/reference/impl/src/test/scala/de/dnpm/dip/mtb/validation/impl/
  * Invalidators.scala:22-111: dangling refs, bad codes, inverted periods,
  * format breaks).
  *
  * Every injection is a pure function of `l_orderkey`, so the expected
  * violation set is ANSI-SQL-expressible for the DuckDB oracle.
  *
  * Injection predicates (ok = l_orderkey, pk = l_partkey):
  *   ok%89=0  -> span0.kind = NULL          (presence break)
  *   ok%83=0  -> span1.kind = 'blob'        (vocabulary break)
  *   ok%79=0  -> span1.media_ref = 'x...'   (dangling FK)
  *   ok%97=0  -> span2.offset = 5           (ordering break: 0,10,5)
  *   ok%73=0  -> span0.text lowercased      (format break, ^[A-Z]{2}$)
  *   ok%71=0  -> spans = []                 (cardinality break; wins last)
  *   ok%67=0  -> span1.text = 'leak'        (cross-field break)
  *   ok%61=0  -> span2.text = '999'         (range break, [1,50])
  *   ok%59=0  -> append span3 ('text','AB',-,0)   (second header: exactly-one break;
  *               also breaks offset ordering, 20 -> 0)
  *   ok%53=0  -> span2.text = NULL          (text-presence + tail either-or break;
  *               wins over ok%61)
  *   ok%47=0  -> append 2 media spans @30,@40     (text-vs-media balance break)
  *   ok%43=0  -> span0.offset = 7           (header-offset equality break)
  *   ok%41=0  -> span1.media_ref = 'v1/m...'      (versioned-catalog membership
  *               break iff pk%1000 is odd; ok%79 wins over ok%41)
  *
  * doc_id duplicates need no injection: the synthetic lineitem already
  * contains repeated (l_orderkey, l_linenumber) pairs, so the docs feed has
  * natural duplicate doc_ids for the uniqueness check.
  */
object DocGen {

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "lineitem")

  /** One doc per lineitem row; three interleaved spans (text, media, text). */
  def docs(spark: SparkSession, sfDir: String): DataFrame =
    docsFrom(lineitem(spark, sfDir))

  /** Span derivation over any lineitem-shaped relation — shared by the
    * batch path and streaming.StreamValidate (same columns, same rules).
    * `keep` carries extra source columns through (e.g. the partition day
    * for watermark-incremental runs). */
  def docsFrom(li: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val ok = col("l_orderkey")
    val pkmod = (col("l_partkey") % 1000).cast("string")
    val flagText = concat(col("l_returnflag"), col("l_linestatus"))

    val s0 = struct(
      when(ok % 89 === 0, lit(null).cast("string")).otherwise(lit("text")).as("kind"),
      when(ok % 73 === 0, lower(flagText)).otherwise(flagText).as("text"),
      lit(null).cast("string").as("media_ref"),
      when(ok % 43 === 0, lit(7)).otherwise(lit(0)).as("offset"))

    val s1 = struct(
      when(ok % 83 === 0, lit("blob")).otherwise(lit("media")).as("kind"),
      when(ok % 67 === 0, lit("leak")).otherwise(lit(null).cast("string")).as("text"),
      when(ok % 79 === 0, concat(lit("x"), pkmod))
        .when(ok % 41 === 0, concat(lit("v1/m"), pkmod))
        .otherwise(concat(lit("m"), pkmod)).as("media_ref"),
      lit(10).as("offset"))

    val s2 = struct(
      lit("text").as("kind"),
      when(ok % 53 === 0, lit(null).cast("string"))
        .when(ok % 61 === 0, lit("999"))
        .otherwise(col("l_quantity").cast("int").cast("string")).as("text"),
      lit(null).cast("string").as("media_ref"),
      when(ok % 97 === 0, lit(5)).otherwise(lit(20)).as("offset"))

    // extra spans for the record-level composite rules
    val s3 = struct(lit("text").as("kind"), lit("AB").as("text"),
      lit(null).cast("string").as("media_ref"), lit(0).as("offset"))
    def mediaTail(offset: Int) = struct(lit("media").as("kind"),
      lit(null).cast("string").as("text"),
      concat(lit("m"), pkmod).as("media_ref"), lit(offset).as("offset"))

    val none = array().cast(Schemas.spanArray)
    val spansArr = concat(
      array(s0, s1, s2).cast(Schemas.spanArray),
      when(ok % 59 === 0, array(s3).cast(Schemas.spanArray)).otherwise(none),
      when(ok % 47 === 0, array(mediaTail(30), mediaTail(40)).cast(Schemas.spanArray))
        .otherwise(none))

    li.select(
      concat(ok.cast("string"), lit("-"), col("l_linenumber").cast("string")).as("doc_id") +:
        when(ok % 71 === 0, none).otherwise(spansArr).as("spans") +:
        keep.map(col): _*)
  }

  /** Media catalog dimension: every valid media_ref + its media kind.
    * Referential target for span.media_ref (the analog of the reference's
    * resolver map at MTBValidators.scala:669-678). */
  def mediaCatalog(spark: SparkSession, sfDir: String): DataFrame = {
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val res = col("p_partkey") % 1000
    part
      .select(
        concat(lit("m"), res.cast("string")).as("media_ref"),
        element_at(
          typedLit(Seq("image", "audio", "video")), (res % 3 + 1).cast("int")
        ).as("media_kind"))
      .distinct()
  }

  /** Collected catalog as a driver-side map for the broadcast row-local
    * membership path (dimension is small; the join-based path for large
    * catalogs lives in engine.Referential). */
  def mediaCatalogMap(spark: SparkSession, sfDir: String): Map[String, String] =
    mediaCatalog(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  /** Closed kind vocabulary (the `CodedEnum` analog, MTBValidators.scala:62-65). */
  val kindVocab: Seq[String] = Seq("text", "media")

  /** Versioned catalog releases (the ICD-O catalog-by-version analog,
    * MTBValidators.scala:136-156): 'v1' is an older release holding only the
    * even-numbered refs; 'v2' (latest) holds everything. A coding carrying
    * no version — or an unknown one — resolves against the latest release,
    * mirroring the reference's `coding.version.flatMap(catalogs(_))
    * .getOrElse(latest)` fallback. */
  val latestCatalogVersion: String = "v2"

  def versionedCatalog(keys: Iterable[String]): Map[String, Seq[String]] = {
    val all = keys.toSeq
    Map(
      "v1" -> all.filter(k => k.drop(1).toLongOption.exists(_ % 2 == 0)),
      "v2" -> all)
  }
}
