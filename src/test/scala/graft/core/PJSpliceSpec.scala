package graft.core

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** O3-O8 splice semantics: the exhaustive permutation oracle
  * (mirror of `/root/reference/python/test/test_palletjack.py:58-107`) plus
  * the metadata round-trip (`:109-133`) and schema API (`:251-318`).
  */
class PJSpliceSpec extends AnyFunSuite {
  private val nRowGroups = 5
  private val nCols = 7

  private lazy val (path, idxPath, indexBytes, origFooterBytes, orig) = {
    val dir = Files.createTempDirectory("pj").toString
    val p = s"$dir/my.parquet"
    TestParquet.writeDoubleTable(p, nRowGroups, nCols)
    val ip = s"$p.index"
    PJIndex.generate(p, ip)
    (p, ip, PJIndex.generate(p), PJIndex.readLocalFooterBytes(p), TestParquet.readFooter(p))
  }

  test("exhaustive permutation oracle: rg-perms x col-perms match the full footer") {
    val allRgs = 0 until nRowGroups
    val allCols = 0 until nCols
    val origBlocks = orig.getBlocks.asScala
    val origSchema = orig.getFileMetaData.getSchema
    var combos = 0
    for (r <- 0 to 3; rp <- allRgs.combinations(r).flatMap(_.permutations);
         c <- 0 to 3; cp <- allCols.combinations(c).flatMap(_.permutations)) {
      val byIdx = PalletJack.readMetadataBytes(idxPath, rp, columnIndices = cp)
      val byName = PalletJack.readMetadataBytes(idxPath, rp, columnNames = cp.map(i => s"column_$i"))
      val byData = PalletJack.readMetadataBytesFromIndexData(indexBytes, rp, columnNames = cp.map(i => s"column_$i"))
      assert(java.util.Arrays.equals(byIdx, byName), s"rg=$rp cols=$cp indices-vs-names")
      assert(java.util.Arrays.equals(byName, byData), s"rg=$rp cols=$cp file-vs-memory")

      val md = PalletJack.materialize(byIdx)
      val expectCols = if (cp.nonEmpty) cp else allCols
      // schema: selected fields, in selection order
      assert(md.getFileMetaData.getSchema.getFields.asScala.toSeq ==
        expectCols.map(origSchema.getFields.get(_)), s"rg=$rp cols=$cp schema")
      if (rp.nonEmpty) {
        val blocks = md.getBlocks.asScala
        assert(blocks.size == rp.size, s"rg=$rp cols=$cp block count")
        assert(blocks.map(_.getRowCount).sum == rp.map(origBlocks(_).getRowCount).sum)
        for ((b, srcRg) <- blocks.zip(rp)) {
          val ob = origBlocks(srcRg)
          assert(b.getRowCount == ob.getRowCount)
          // with a column subset the block's starting pos is the first
          // *selected* chunk's — only compare when all columns are kept
          if (cp.isEmpty)
            assert(b.getStartingPos == ob.getStartingPos, s"rg=$rp cols=$cp: data offsets must stay absolute")
          val cols = b.getColumns.asScala
          assert(cols.size == expectCols.size)
          for ((cc, srcCol) <- cols.zip(expectCols)) {
            val oc = ob.getColumns.get(srcCol)
            assert(cc.getPath == oc.getPath, s"rg=$rp cols=$cp chunk path")
            assert(cc.getStartingPos == oc.getStartingPos, s"rg=$rp cols=$cp chunk offset")
            assert(cc.getTotalSize == oc.getTotalSize)
          }
        }
      }
      combos += 1
    }
    info(s"verified $combos rg-perm x col-perm combinations")
  }

  test("metadata roundtrip: all/none selections reproduce the original footer") {
    // ([], []) is a pure byte copy
    val noop = PalletJack.readMetadataBytes(idxPath)
    assert(java.util.Arrays.equals(noop, origFooterBytes))

    // all-rows / all-columns selections parse back to the original structure
    val combos = Seq(
      (Nil, 0 until nCols),
      (0 until nRowGroups, Nil),
      (0 until nRowGroups, 0 until nCols))
    for ((rgs, cols) <- combos) {
      val md = PalletJack.materialize(PalletJack.readMetadataBytes(idxPath, rgs, cols))
      assert(md.getFileMetaData.getSchema == orig.getFileMetaData.getSchema, s"($rgs,$cols)")
      assert(md.getBlocks.size() == orig.getBlocks.size())
      for (i <- 0 until nRowGroups) {
        assert(md.getBlocks.get(i).getRowCount == orig.getBlocks.get(i).getRowCount)
        assert(md.getBlocks.get(i).getColumns.size() == nCols)
      }
    }
  }

  test("read_schema: full, per-column, by-name, multi-column; num_rows=0, no row groups") {
    val origSchema = orig.getFileMetaData.getSchema
    assert(PalletJack.readSchema(idxPath) == origSchema)

    for (c <- 0 until nCols) {
      val s = PalletJack.readSchema(idxPath, columnIndices = Seq(c))
      assert(s.getFieldCount == 1)
      assert(s.getFields.get(0) == origSchema.getFields.get(c))
      val sn = PalletJack.readSchema(idxPath, columnNames = Seq(s"column_$c"))
      assert(sn.getFields.get(0).getName == s"column_$c")
    }

    val multi = PalletJack.readSchema(idxPath, columnIndices = Seq(0, 2, 4))
    assert(multi.getFields.asScala.toSeq == Seq(0, 2, 4).map(origSchema.getFields.get(_)))

    // schema_only ⇒ num_rows=0 and an empty row-group list (palletjack.cc:492)
    val md = PalletJack.materialize(PalletJack.readMetadataBytes(idxPath, schemaOnly = true))
    assert(md.getBlocks.isEmpty)

    // in-memory variant (test_read_schema_non_pyarrow_files analogue)
    assert(PalletJack.readSchemaFromIndexData(indexBytes) == origSchema)
  }

  test("duplicate selection is allowed and order-preserving") {
    val md = PalletJack.materialize(
      PalletJack.readMetadataBytes(idxPath, Seq(3, 1, 3), columnIndices = Seq(6, 0, 6)))
    val origSchema = orig.getFileMetaData.getSchema
    assert(md.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSeq ==
      Seq("column_6", "column_0", "column_6"))
    // per-chunk absolute offsets: block i is source rg (3,1,3), cols (6,0,6)
    for ((b, srcRg) <- md.getBlocks.asScala.zip(Seq(3, 1, 3)); (cc, srcCol) <- b.getColumns.asScala.zip(Seq(6, 0, 6)))
      assert(cc.getStartingPos == orig.getBlocks.get(srcRg).getColumns.get(srcCol).getStartingPos)
  }
}
