package graft.core

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** PJ_3 nested-extension splice semantics: the PJ_2 permutation-oracle
  * methodology ([[PJSpliceSpec]]) applied to a nested schema, where a
  * "column" is a top-level SUBTREE — selected subtrees keep ALL their
  * schema elements and leaf chunks, in selection order, with every chunk
  * offset absolute and byte-identical to the original footer's.
  */
class PJ3SpliceSpec extends AnyFunSuite {

  // nested fixture: 3 top-level fields — a plain leaf, a 2-leaf struct,
  // and a (3-element, 1-leaf) list — across several row groups
  private lazy val (footer, pj3, orig) = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("pj3_core").toString
    spark.range(1200).select(
      $"id",
      struct(($"id" % 5).as("a"), concat(lit("s-"), $"id").as("b")).as("meta"),
      array($"id" * 2, $"id" * 3).as("pair"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", "4096")
      .parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
    val fb = PJIndex.readLocalFooterBytes(file.toString)
    (fb, PJIndex.generateNestedFromFooter(fb, file.toString), PalletJack.materialize(fb))
  }

  private lazy val idx = PJSplice.Index.fromBytes(pj3)
  // leaf-ordinal ranges per top-level field: id=[0,1), meta=[1,3), pair=[3,4)
  private val leafRange = Seq((0, 1), (1, 3), (3, 4))
  private val fieldNames = Seq("id", "meta", "pair")

  test("header, names, and subtree metadata describe the nested shape") {
    assert(idx.header.nested)
    assert(idx.header.columns == 3)
    assert(idx.columnNames.toSeq == fieldNames)
    assert((0 until 3).map(idx.leavesOf) == Seq(1, 2, 1))
    // id is one element; meta = group + 2 leaves; pair = 3-level list
    assert(idx.elemsOf(0) == 1)
    assert(idx.elemsOf(1) == 3)
    assert(idx.elemsOf(2) == 3)
    val rgs = orig.getBlocks.size
    assert(idx.header.rowGroups == rgs && rgs > 1, s"fixture needs several row groups, got $rgs")
    for (rg <- 0 until rgs)
      assert(idx.rowNumber(rg) == orig.getBlocks.get(rg).getRowCount)
  }

  test("exhaustive permutation oracle: rg-perms x subtree-perms match the full footer") {
    val nRgs = idx.header.rowGroups
    val allRgs = 0 until math.min(nRgs, 4)
    val origBlocks = orig.getBlocks.asScala
    val origFields = orig.getFileMetaData.getSchema.getFields.asScala.toSeq
    var combos = 0
    for (r <- 0 to 2; rp <- allRgs.combinations(r).flatMap(_.permutations);
         c <- 0 to 3; cp <- (0 until 3).combinations(c).flatMap(_.permutations)) {
      val byIdx = PJSplice.splice(idx, rp, cp, Nil, schemaOnly = false)
      val byName = PJSplice.splice(idx, rp, Nil, cp.map(fieldNames), schemaOnly = false)
      assert(java.util.Arrays.equals(byIdx, byName), s"rg=$rp fields=$cp indices-vs-names")

      val md = PalletJack.materialize(byIdx)
      val expectFields = if (cp.nonEmpty) cp else 0 until 3
      // schema: the selected subtrees, whole and in selection order
      assert(md.getFileMetaData.getSchema.getFields.asScala.toSeq ==
        expectFields.map(origFields), s"rg=$rp fields=$cp schema")
      if (rp.nonEmpty) {
        val blocks = md.getBlocks.asScala
        assert(blocks.size == rp.size, s"rg=$rp fields=$cp block count")
        for ((b, srcRg) <- blocks.zip(rp)) {
          val ob = origBlocks(srcRg)
          assert(b.getRowCount == ob.getRowCount)
          val expectChunks = expectFields.flatMap { f =>
            val (lo, hi) = leafRange(f)
            (lo until hi).map(ob.getColumns.get(_))
          }
          val chunks = b.getColumns.asScala.toSeq
          assert(chunks.size == expectChunks.size, s"rg=$rp fields=$cp chunk count")
          for ((cc, oc) <- chunks.zip(expectChunks)) {
            assert(cc.getPath == oc.getPath, s"rg=$rp fields=$cp chunk path")
            assert(cc.getStartingPos == oc.getStartingPos,
              s"rg=$rp fields=$cp: chunk offsets must stay absolute")
            assert(cc.getTotalSize == oc.getTotalSize)
          }
        }
      }
      combos += 1
    }
    info(s"verified $combos rg-perm x subtree-perm combinations")
  }

  test("no-op splice is a pure byte copy; schema-only empties the row groups") {
    val noop = PJSplice.splice(idx, Nil, Nil, Nil, schemaOnly = false)
    assert(java.util.Arrays.equals(noop, footer))
    val so = PalletJack.materialize(PJSplice.splice(idx, Nil, Nil, Nil, schemaOnly = true))
    assert(so.getBlocks.isEmpty)
    assert(so.getFileMetaData.getSchema == orig.getFileMetaData.getSchema)
  }

  test("stats guard: leaf top-level fields keep chunk stats, group fields are unknown") {
    // id (plain leaf): real stats with the INT64 physical type
    val st = idx.chunkStats(0, 0)
    assert(st.physType == 2 && st.min != null && st.max != null)
    // meta / pair (groups): unknown — first-leaf stats must never stand in
    assert(idx.chunkStats(0, 1).physType == -1)
    assert(idx.chunkStats(0, 2).physType == -1)
    // compressed-size walk: exact for 1-leaf fields, unknown for multi-leaf
    assert(idx.chunkCompressedSize(0, 0) > 0)
    assert(idx.chunkCompressedSize(0, 2) > 0, "1-leaf list field is walkable")
    assert(idx.chunkCompressedSize(0, 1) == -1L, "2-leaf struct must report unknown")
  }

  test("random nested shapes: splice equals ground truth for every generated schema") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    val rnd = new scala.util.Random(42) // deterministic shapes
    val base = spark.range(300)
    val id = col("id")

    def leafCol(tag: String): Column = rnd.nextInt(3) match {
      case 0 => (id * (rnd.nextInt(7) + 1)).as(tag)
      case 1 => concat(lit(tag + "-"), id).as(tag)
      case _ => (id % (rnd.nextInt(9) + 2)).cast("int").as(tag)
    }
    def fieldCol(tag: String, depth: Int): Column = rnd.nextInt(4) match {
      case 0 => leafCol(tag)
      case 1 => array(id, id * 2).as(tag)
      case 2 if depth < 2 =>
        struct((0 until rnd.nextInt(3) + 1).map(j => fieldCol(s"${tag}_s$j", depth + 1)): _*).as(tag)
      case _ => struct(leafCol(s"${tag}_x"), leafCol(s"${tag}_y")).as(tag)
    }

    for (shape <- 0 until 6) {
      val nFields = rnd.nextInt(4) + 2
      val cols = (0 until nFields).map(f => fieldCol(s"f$f", 0))
      val dir = java.nio.file.Files.createTempDirectory(s"pj3_rand_$shape").toString
      base.select(cols: _*).coalesce(1)
        .write.mode("overwrite").option("parquet.block.size", "4096").parquet(dir)
      val file = new java.io.File(dir).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
      val fb = PJIndex.readLocalFooterBytes(file.toString)
      val og = PalletJack.materialize(fb)
      val nestedShape = PJIndex.footerHasNestedSchema(fb)
      val ix = PJSplice.Index.fromBytes(
        if (nestedShape) PJIndex.generateNestedFromFooter(fb, file.toString)
        else PJIndex.generateFromFooter(fb, file.toString))
      val fields = og.getFileMetaData.getSchema.getFields.asScala.toSeq
      assert(ix.columnNames.toSeq == fields.map(_.getName), s"shape $shape names")
      // ground-truth leaf ranges from chunk path heads (depth-first order
      // groups leaves by top-level field)
      val heads = og.getBlocks.get(0).getColumns.asScala.map(_.getPath.toArray.apply(0)).toSeq
      val ranges = fields.map(_.getName).map { n =>
        (heads.indexOf(n), heads.lastIndexOf(n) + 1)
      }
      for (f <- fields.indices)
        assert(ix.leavesOf(f) == ranges(f)._2 - ranges(f)._1, s"shape $shape leaves f$f")
      // random selections vs ground truth
      val nRgs = og.getBlocks.size
      for (_ <- 0 until 8) {
        val rp = (0 until nRgs).filter(_ => rnd.nextBoolean())
        val cp = fields.indices.filter(_ => rnd.nextBoolean())
        val md = PalletJack.materialize(
          PJSplice.splice(ix, rp, cp, Nil, schemaOnly = false))
        val expF = if (cp.nonEmpty) cp else fields.indices
        assert(md.getFileMetaData.getSchema.getFields.asScala.toSeq ==
          expF.map(fields), s"shape $shape rg=$rp f=$cp schema")
        val expRgs = if (rp.nonEmpty) rp else 0 until nRgs
        assert(md.getBlocks.size == expRgs.size)
        for ((b, src) <- md.getBlocks.asScala.zip(expRgs)) {
          val ob = og.getBlocks.get(src)
          val expChunks = expF.flatMap { f =>
            (ranges(f)._1 until ranges(f)._2).map(ob.getColumns.get(_))
          }
          val chunks = b.getColumns.asScala.toSeq
          assert(chunks.size == expChunks.size, s"shape $shape rg=$rp f=$cp chunks")
          for ((cc, oc) <- chunks.zip(expChunks)) {
            assert(cc.getPath == oc.getPath && cc.getStartingPos == oc.getStartingPos &&
              cc.getTotalSize == oc.getTotalSize, s"shape $shape rg=$rp f=$cp chunk")
          }
        }
      }
    }
  }

  test("PJ_2 rejects what PJ_3 accepts: the compat format stays flat-only") {
    val e = intercept[PJException](PJIndex.generateFromFooter(footer, "nested.parquet"))
    assert(e.getMessage.contains("Schema offsets information is invalid"))
    assert(PJIndex.footerHasNestedSchema(footer))
  }
}
