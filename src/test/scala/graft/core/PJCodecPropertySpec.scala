package graft.core

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property layer the reference lacks (SURVEY.md §5): random file shapes
  * (row groups × columns × mixed physical types) and random selections must
  * always satisfy prune ≡ full-read at the metadata level. Uses ScalaCheck
  * generators with a fixed seed (deterministic, no scalatestplus bridge).
  */
class PJCodecPropertySpec extends AnyFunSuite {

  private val dir = Files.createTempDirectory("pjprop").toString
  private var fileNo = 0

  private def writeFile(nRgs: Int, types: Seq[String]): String = {
    fileNo += 1
    val path = s"$dir/f$fileNo.parquet"
    val fields = types.zipWithIndex.map { case (t, i) => s"  required $t col_$i;" }.mkString("\n")
    val schema = MessageTypeParser.parseMessageType(s"message m {\n$fields\n}")
    val writer = ExampleParquetWriter.builder(new Path(path))
      .withConf(new Configuration())
      .withType(schema)
      .withRowGroupSize(8L)
      .withDictionaryEncoding(false)
      .withMinRowCountForPageSizeCheck(1)
      .withMaxRowCountForPageSizeCheck(1)
      .build()
    val rnd = new scala.util.Random(nRgs * 31 + types.length)
    try {
      for (_ <- 0 until nRgs) {
        val g = new SimpleGroup(schema)
        types.zipWithIndex.foreach { case (t, i) =>
          t match {
            case "double" => g.add(s"col_$i", rnd.nextDouble())
            case "int64" => g.add(s"col_$i", rnd.nextLong())
            case "int32" => g.add(s"col_$i", rnd.nextInt())
            case "binary" => g.add(s"col_$i", s"s${rnd.nextInt(1000)}")
            case "boolean" => g.add(s"col_$i", rnd.nextBoolean())
            case "float" => g.add(s"col_$i", rnd.nextFloat())
          }
        }
        writer.write(g)
      }
    } finally writer.close()
    path
  }

  private val shapeGen: Gen[(Int, List[String])] = for {
    nRgs <- Gen.choose(1, 6)
    nCols <- Gen.choose(1, 8)
    types <- Gen.listOfN(nCols,
      Gen.oneOf("double", "int64", "int32", "binary", "boolean", "float"))
  } yield (nRgs, types)

  test("property: random shapes and selections splice consistently") {
    var checked = 0
    for (trial <- 0 until 15) {
      val (nRgs, types) = shapeGen(Gen.Parameters.default, Seed(trial.toLong)).get
      val path = writeFile(nRgs, types)
      val orig = TestParquet.readFooter(path)
      // tiny all-boolean rows may coalesce into fewer groups — use actuals
      val actualRgs = orig.getBlocks.size()

      val idx = PJIndex.generate(path)
      val rnd = new scala.util.Random(trial)
      val rgSel = (0 until actualRgs).filter(_ => rnd.nextBoolean())
      val colSel = types.indices.filter(_ => rnd.nextBoolean())
      val md = PalletJack.materialize(
        PalletJack.readMetadataBytesFromIndexData(idx, rgSel, colSel))

      val expectCols = if (colSel.nonEmpty) colSel else types.indices
      val origSchema = orig.getFileMetaData.getSchema
      assert(md.getFileMetaData.getSchema.getFields.asScala.toSeq ==
        expectCols.map(origSchema.getFields.get(_)).toSeq,
        s"trial $trial rgSel=$rgSel colSel=$colSel")

      val expectRgs = if (rgSel.nonEmpty) rgSel else 0 until actualRgs
      assert(md.getBlocks.size() == expectRgs.size)
      for ((b, srcRg) <- md.getBlocks.asScala.zip(expectRgs)) {
        val ob = orig.getBlocks.get(srcRg)
        assert(b.getRowCount == ob.getRowCount)
        for ((cc, srcCol) <- b.getColumns.asScala.zip(expectCols)) {
          val oc = ob.getColumns.get(srcCol)
          assert(cc.getPath == oc.getPath)
          assert(cc.getStartingPos == oc.getStartingPos)
          assert(cc.getTotalSize == oc.getTotalSize)
        }
      }
      checked += 1
    }
    info(s"$checked random shapes verified")
  }
}
