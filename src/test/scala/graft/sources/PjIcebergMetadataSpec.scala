package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.{PjCommitLog, PjIcebergMetadata}

/** Iceberg-metadata export (UniForm-style, round 18): the head snapshot
  * materializes as Iceberg v2 `metadata/vN.metadata.json` + avro manifest
  * list + manifest, validated field-by-field against the commit log —
  * file list, schema (with field ids), partition spec, snapshot id.
  */
class PjIcebergMetadataSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjice", "graft.sources.pjparquet.PjCatalog")

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    java.nio.file.Files.delete(d)
    d.toString
  }

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private val mapper = new ObjectMapper()

  private def readAvro(path: String): Seq[org.apache.avro.generic.GenericRecord] = {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val r = new DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toList finally r.close()
  }

  test("export validates against the commit log: files, schema ids, spec, snapshot id") {
    val t = freshDir("pj_ice")
    spark.sql(s"CREATE TABLE pjice.`$t` (k BIGINT, name STRING, part STRING) " +
      "USING pjparquet PARTITIONED BY (part)")
    spark.range(0, 20).select($"id".as("k"), concat(lit("n"), $"id").as("name"),
      (when($"id" % 2 === 0, "even").otherwise("odd")).as("part"))
      .writeTo(s"pjice.`$t`").append()
    val rep = spark.sql(
      s"CALL pjice.system.generate_iceberg_metadata(table => '$t')").collect().head
    val fs = fsOf(t)
    val snap = PjCommitLog.latest(fs, new Path(t)).get
    assert(rep.getLong(0) == snap.version)
    assert(rep.getLong(2) == snap.entries.size.toLong)

    // vN.metadata.json + HadoopCatalog version hint
    val md = mapper.readTree(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "metadata", s"v${snap.version}.metadata.json")))
    assert(md.get("format-version").asInt == 2)
    assert(md.get("current-snapshot-id").asLong == snap.version)
    val hint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "metadata", "version-hint.text")), "UTF-8")
    assert(hint == snap.version.toString)

    // schema: every field carries an id; names match the recorded schema
    val fields = md.get("schemas").get(0).get("fields").elements().asScala.toSeq
    assert(fields.map(_.get("name").asText) == Seq("k", "name", "part"))
    assert(fields.map(_.get("id").asLong) == Seq(1L, 2L, 3L))
    assert(md.get("last-column-id").asLong >= 3L)

    // partition spec: identity on `part`, sourcing its field id
    val specF = md.get("partition-specs").get(0).get("fields").get(0)
    assert(specF.get("name").asText == "part")
    assert(specF.get("transform").asText == "identity")
    assert(specF.get("source-id").asLong == 3L)
    assert(specF.get("field-id").asLong == 1000L)

    // manifest list -> manifest -> exact file list + rows + partition values
    val listPath = md.get("snapshots").get(0).get("manifest-list").asText
      .stripPrefix("file:")
    val listRows = readAvro(listPath)
    assert(listRows.size == 1)
    val mf = listRows.head
    assert(mf.get("added_snapshot_id").asInstanceOf[Long] == snap.version)
    assert(mf.get("added_files_count").asInstanceOf[Int] == snap.entries.size)
    val manifestPath = mf.get("manifest_path").toString.stripPrefix("file:")
    val entries = readAvro(manifestPath)
    assert(entries.size == snap.entries.size)
    val rootUri = fs.makeQualified(new Path(t)).toString
    val wantFiles = snap.entries.map(e => s"$rootUri/${e.path}").toSet
    val gotFiles = entries.map(_.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("file_path").toString).toSet
    assert(gotFiles == wantFiles)
    for (en <- entries) {
      val df = en.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      val path = df.get("file_path").toString
      val e = snap.entries.find(x => s"$rootUri/${x.path}" == path).get
      assert(df.get("record_count").asInstanceOf[Long] == e.rows)
      assert(df.get("file_size_in_bytes").asInstanceOf[Long] == e.size)
      val pv = df.get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
      val wantPart = e.path.split("/").head.stripPrefix("part=")
      assert(pv.get("part").toString == wantPart, s"$path -> $pv")
    }
  }

  test("id-mode tables export their RECORDED field ids verbatim") {
    val t = freshDir("pj_ice_id")
    spark.sql(s"CREATE TABLE pjice.`$t` (a BIGINT, b STRING) USING pjparquet " +
      "TBLPROPERTIES ('pj.columnMapping.mode'='id')")
    spark.sql(s"ALTER TABLE pjice.`$t` ADD COLUMN c BIGINT")
    spark.sql(s"ALTER TABLE pjice.`$t` DROP COLUMN b")
    spark.range(3).select($"id".as("a"), ($"id" * 7).as("c"))
      .writeTo(s"pjice.`$t`").append()
    PjIcebergMetadata.generate(spark, t)
    val fs = fsOf(t)
    val snap = PjCommitLog.latest(fs, new Path(t)).get
    val md = mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "metadata", s"v${snap.version}.metadata.json")))
    val fields = md.get("schemas").get(0).get("fields").elements().asScala.toSeq
    // b (id 2) was dropped; a keeps 1, c keeps its never-reused id 3
    assert(fields.map(f => f.get("name").asText -> f.get("id").asLong) ==
      Seq("a" -> 1L, "c" -> 3L))
  }

  test("live deletion vectors refuse; auto-maintenance re-exports per commit") {
    val t = freshDir("pj_ice_dv")
    spark.sql(s"CREATE TABLE pjice.`$t` (k BIGINT, v BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.icebergMetadata.enabled'='true')")
    spark.range(0, 10).select($"id".as("k"), ($"id" * 2).as("v"))
      .writeTo(s"pjice.`$t`").append()
    // the append's auto-maintenance exported v2 already
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "metadata", "v2.metadata.json")))
    // a DV delete refuses the explicit export (and the auto hook skips)
    spark.sql(s"DELETE FROM pjice.`$t` WHERE k < 3")
    val e = intercept[PJException] { PjIcebergMetadata.generate(spark, t) }
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // the hint still names the last DV-free export
    val hint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "metadata", "version-hint.text")), "UTF-8")
    assert(hint == "2")
  }
}
