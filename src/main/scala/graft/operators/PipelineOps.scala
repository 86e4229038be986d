package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (SURVEY.md §2.3), built as reusable
  * DataFrame transforms. Every operator is shuffle-conscious for the 100 TB
  * design point:
  *
  *  - dedup keys are hashes (uniform partitioning, no skew on text length)
  *  - near-dup never does all-pairs: candidates come from LSH buckets or
  *    (lang, length-band) blocking before any pairwise work
  *  - similarity search broadcasts the (small) probe side; the corpus side
  *    streams partition-local
  *  - everything is built-in `functions._` / higher-order functions — no
  *    Scala UDFs in hot paths, so whole-stage codegen stays intact
  */
/** Lifecycle handle over the slim persisted projections an ANN call pins
  * (`lshAnnPairsWithHandle` / `embeddingNearDupPairsWithHandle`): `close()`
  * unpersists exactly this call's caches, so long-lived sessions composing
  * many ANN calls don't accumulate projections until a global
  * `clearCache()`. Idempotent; safe under try-with-resources /
  * `Using.resource`.
  */
final class AnnCacheHandle private[operators] (pinned: Seq[DataFrame]) extends AutoCloseable {
  override def close(): Unit = pinned.foreach(_.unpersist())
}

object PipelineOps {

  /** Round-robin a few-file input over the cores before compute-heavy
    * per-row work (r19, guide §2.6): a single-row-group parquet file scans
    * as ONE working task no matter how many splits Spark plans (only the
    * split holding the row-group midpoint does work), serializing scalar
    * prep that should use the whole machine. Inputs with at least one
    * file per core are already parallel and are returned untouched — at
    * 100 TB the corpus has thousands of files and this is the identity.
    * The guard counts FILES, not planned splits, because split count
    * over-reports real scan parallelism exactly in the single-row-group
    * case this helper exists for.
    */
  private[graft] def spreadIfNarrow(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length >= p) df else df.repartition(p)
  }

  // ---------------------------------------------------------------- dedup

  /** Exact dedup: content-hash groupBy keeping the smallest id. At scale the
    * shuffle key is the 256-bit hash — uniform, skew-free.
    */
  def exactDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Keyed dedup (deterministic `dropDuplicates`): earliest id per key. */
  def dedupByKey(docs: DataFrame, keys: Seq[String], idCol: String = "doc_id"): DataFrame =
    docs.groupBy(keys.map(col): _*).agg(min(col(idCol)).as("first_" + idCol))

  /** IN-PLACE dedup of a logged pjparquet table — the 100 TB corpus
    * primitive that marries the dedup family to merge-on-read DML: rows
    * sharing `keys` keep exactly ONE representative (the smallest
    * (`_file`, `_pos`) identity — deterministic, rerun-stable) and every
    * other copy retires by POSITION into deletion vectors
    * ([[graft.sources.pjparquet.PjDvDelete.deletePositions]]). One
    * hash-partitioned window over (keys) finds the losers, one commit
    * lands them; NOTHING is rewritten — deduping a 100 TB corpus writes
    * kilobytes of vectors per file instead of re-materializing the
    * surviving 95 %. Returns (committed version, duplicates removed).
    */
  def dedupInPlace(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      keys: Seq[String]): (Option[Long], Long) = {
    import graft.sources.pjparquet.{PjCommitLog, PjDvDelete, PjParquetTable}
    import spark.implicits._
    require(keys.nonEmpty, "dedupInPlace needs at least one key column")
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    val layout = PjParquetTable.resolveFiles(root, conf, autogen = true)
    val base = layout.logVersion.getOrElse(
      throw new graft.core.PJException(
        s"pjparquet: dedupInPlace requires a commit-log table ('$root')"))
    val t = spark.read.format("pjparquet")
      .option("versionAsOf", base.toString).load(root)
    val losers = dedupLosers(t, keys).as[(String, Long)]
    // dedup reads every partition — declare the full partition read set
    val readPartitions = layout.files.map(_.partitionValues).toSet
    val v = PjDvDelete.deletePositions(
      spark, fs, rootPath, layout, losers,
      operation = "delete", readPartitions = readPartitions)
    val removed = v.map { committed =>
      val head = PjCommitLog.read(fs, rootPath, committed)
      val prev = PjCommitLog.read(fs, rootPath, base)
      prev.entries.iterator.map(e => math.max(0L, e.liveRows)).sum -
        head.entries.iterator.map(e => math.max(0L, e.liveRows)).sum
    }.getOrElse(0L)
    (v, removed)
  }

  /** Loser-selection plan for [[dedupInPlace]] — exposed for plan-shape
    * tests. Slim-key shuffle: the key columns hash down to a 32-byte
    * digest BEFORE the window (the same sha256 recipe
    * [[incrementalDedup]] ships its history on), so the exchange carries
    * (digest, `_file`, `_pos`) — ~3 % of a text-keyed corpus — instead
    * of the raw key payload. Per-column fixed-width sha256 hex then a
    * digest-of-digests keeps multi-key grouping unambiguous (no
    * separator-injection or null-coalescing collisions); a sha256
    * collision is far below hardware error rates, so the dedup stays
    * exact in practice. Returns `(f = _file, p = _pos)` of every
    * non-representative row.
    */
  private[graft] def dedupLosers(t: DataFrame, keys: Seq[String]): DataFrame = {
    val keyDigest = sha2(
      concat_ws("", keys.map(k =>
        coalesce(sha2(col(k).cast("string"), 256), lit("-"))): _*), 256)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_kd"))
      .orderBy(col("_file").asc, col("_pos").asc)
    t.select(keyDigest.as("_kd"), col("_file"), col("_pos"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") > 1)
      .select(col("_file").as("f"), col("_pos").as("p"))
  }

  /** Incremental dedup — the daily-ingest primitive: drop every new
    * document whose content hash is already in `seenHashes` (column
    * `content_hash`, the accumulated history), then dedup within the
    * batch itself (earliest id wins). Returns `(content_hash, idCol,
    * dup_count)` — union `content_hash` back into the history table for
    * the next increment. The anti join is on the 256-bit hash: uniform,
    * skew-free, and the only thing the history side ever ships — at
    * 100 TB the corpus text stays in place and a 32-byte key per
    * historical doc moves.
    */
  def incrementalDedup(
      newDocs: DataFrame,
      seenHashes: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    newDocs
      .withColumn("content_hash", sha2(col(textCol), 256))
      .join(seenHashes.select(col("content_hash")), Seq("content_hash"), "left_anti")
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Canonical URL normalization for URL-level exact dedup (the standard
    * pretraining crawl-dedup key): strip the `#fragment`, lowercase the
    * `scheme://host` (path case is significant, so it survives), drop
    * `utm_*` tracking params (fixing separators), drop a dangling `?`, and
    * drop one trailing `/`. Pure codegen'd string expressions — row-local,
    * no shuffle, no UDF. Non-URL strings pass through the same rules
    * unharmed (no scheme → nothing to lowercase).
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // scheme://host[:port] prefix; "" when the string has no scheme
    val head = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*", 0)
    val lowered = concat(lower(head), noFrag.substr(length(head) + 1, length(noFrag)))
    // utm params followed by another param, then a trailing utm param
    val noUtm = regexp_replace(
      regexp_replace(lowered, "utm_[^&]*&", ""), "[?&]utm_[^&]*$", "")
    regexp_replace(regexp_replace(noUtm, "\\?$", ""), "/$", "")
  }

  /** URL-level exact dedup: normalize, then one hash-partitioned groupBy on
    * the canonical URL (uniform shuffle key) keeping the smallest id.
    */
  def urlDedup(docs: DataFrame, urlCol: String = "url", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(normalizeUrl(col(urlCol)).as("norm_url"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Exact n-token-substring overlap: unordered doc pairs sharing at least
    * one exact run of `n` consecutive tokens — the "50-token exact
    * substring" dedup of pretraining pipelines, at a spec-able `n`.
    *
    * Scale shape: each doc emits its distinct gram HASHES (xxhash64 — slim
    * 8-byte shuffle keys, never the gram strings), a document-frequency
    * filter drops boilerplate grams (`df > maxDf` — a gram in `d` docs
    * yields O(d²) candidate pairs, so ubiquitous boilerplate would
    * otherwise quadratically dominate; standard practice drops it), and
    * the pair join runs on the filtered slim keys. Never all-pairs.
    */
  /** `(_id, gram)` rows: the distinct xxhash64 of every n-token substring of
    * each document (docs shorter than `n` tokens emit nothing). The slim
    * 16-byte shuffle unit shared by substring-overlap dedup and
    * decontamination.
    */
  private def explodedGramHashes(
      docs: DataFrame, n: Int, textCol: String, idCol: String): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    // token-hash recipe (see [[shingleHashes]]): hash each token once into
    // a MATERIALIZED array column, then combine n adjacent hashes per
    // window with one more xxhash64 — the gram string never materializes.
    // The old concat_ws(slice(toks))-per-window form allocated O(windows)
    // UTF8 strings inside an interpreted lambda: ~10× the integer cost and
    // enough allocation churn that q67's bench time was GC-noise-bound.
    docs
      // length-gate on the plain split (same count as _th) so the pushed
      // scan filter stays lambda-free
      .filter(size(tokens(col(textCol))) >= n)
      .select(col(idCol).as("_id"), tokenHashes(col(textCol)).as("_th"))
      .select(col("_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("_th")) - (n - 1)),
          i => xxhash64((0 until n).map(o => element_at(col("_th"), i + o)): _*))))
          .as("gram"))
  }

  def ngramOverlapPairs(
      docs: DataFrame,
      n: Int = 5,
      maxDf: Int = 1000,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val grams = explodedGramHashes(docs, n, textCol, idCol)
    val rare = grams.groupBy(col("gram")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf).select(col("gram"))
    val g = grams.join(rare, "gram")
    g.select(col("gram"), col("_id").as("id_a"))
      .join(g.select(col("gram"), col("_id").as("id_b")), "gram")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Cross-document repeated-substring EXCISION — span-level exact dedup
    * (the within-document counterpart of dropping whole duplicate docs,
    * after Lee et al. 2022's substring dedup): any n-token substring that
    * appears in at least `minDf` distinct documents is cut out of every
    * document it covers, and the residual text survives. Whole-doc dedup
    * misses boilerplate (headers, license blocks, navigation chrome)
    * pasted into otherwise-unique pages; this removes exactly those spans.
    *
    * Shape, 100 TB lens: the only corpus-wide shuffle moves slim
    * (64-bit gram hash, doc id) pairs — token-hash n-grams per the
    * [[ngramHashes]] recipe, the gram STRING never materializes — and the
    * per-document repair is one slim (id, sorted start positions) join
    * back to the docs followed by pure per-row HOF arithmetic (merge the
    * covering intervals, keep uncovered tokens). Nothing is O(corpus²):
    * frequency decides, not pairwise comparison.
    *
    * Output: the input columns plus `clean_text` (repeated spans removed,
    * single-space rejoin of surviving whitespace tokens),
    * `n_repeated_starts` (repeated n-gram start positions), and
    * `tokens_removed`. A doc shorter than n tokens passes through intact.
    */
  def removeRepeatedSpans(
      docs: DataFrame,
      n: Int = 5,
      minDf: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id",
      /** `keepFirst = true` (Lee et al. 2022 semantics): the CANONICAL
        * occurrence of each repeated n-gram — smallest (doc, position)
        * corpus-wide — survives; only the other occurrences excise. The
        * default removes every occurrence (boilerplate killing); keep-first
        * is what training-data dedup wants — one copy of the span stays in
        * the corpus. Costs one extra slim aggregation
        * (`min(struct(id, pos))` per repeated gram, map-side combined).
        */
      keepFirst: Boolean = false): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    // (doc, start position, gram hash) for every n-token window; token
    // hashes materialized once (interpreted-lambda rule: see ngramHashes)
    val pos = docs
      // length-gate on the plain split (same count as _th) so the pushed
      // scan filter stays lambda-free — a filter on the HOF column would
      // be substituted into the scan and re-run the hash per input row
      .filter(size(tokens(col(textCol))) >= n)
      .select(col(idCol).as("_id"), tokenHashes(col(textCol)).as("_th"))
      .select(col("_id"), explode(transform(
        sequence(lit(1), size(col("_th")) - (n - 1)),
        i => struct(i.as("pos"),
          xxhash64((0 until n).map(o => element_at(col("_th"), i + o)): _*).as("gram"))))
        .as("_pg"))
      .select(col("_id"), col("_pg.pos").as("pos"), col("_pg.gram").as("gram"))
    // corpus-repeated grams: distinct-document frequency >= minDf
    val repeated = pos.select(col("gram"), col("_id")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDf)
      .select(col("gram"))
    // occurrences to excise: every covered window, or (keepFirst) every
    // window EXCEPT the gram's canonical smallest-(doc, pos) occurrence
    val excised =
      if (!keepFirst) pos.join(repeated, "gram")
      else {
        val firsts = pos.join(repeated, "gram")
          .groupBy(col("gram"))
          .agg(min(struct(col("_id"), col("pos"))).as("_first"))
        pos.join(firsts, "gram")
          .filter(col("_first") =!= struct(col("_id"), col("pos")))
      }
    // per-doc sorted repeated start positions (a repeat at p covers
    // tokens [p, p+n)); collect_set because several windows of one doc
    // can share a gram hash
    val starts = excised
      .groupBy(col("_id"))
      .agg(array_sort(collect_set(col("pos"))).as("_starts"))
    val joined = docs.join(starts, docs(idCol) === starts("_id"), "left")
      .drop("_id")
      .withColumn("_starts", coalesce(col("_starts"),
        array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType))))
      .withColumn("_toks", tokens(col(textCol)))
    joined
      .withColumn("_keep", filter(
        sequence(lit(1), size(col("_toks"))),
        i => not(exists(col("_starts"), p => p <= i && i < p + n))))
      .withColumn("clean_text",
        concat_ws(" ", transform(col("_keep"), i => element_at(col("_toks"), i))))
      .withColumn("n_repeated_starts", size(col("_starts")).cast("long"))
      .withColumn("tokens_removed",
        (size(col("_toks")) - size(col("_keep"))).cast("long"))
      .drop("_starts", "_toks", "_keep")
  }

  /** CCNet-style line-level (paragraph) dedup across the WHOLE corpus:
    * split each document on newlines, keep only the FIRST occurrence of
    * every distinct non-blank line — first = smallest (`idCol`, position)
    * — and reassemble documents from their surviving lines in original
    * order. The op web pipelines run before document-level dedup: nav
    * menus, cookie banners, and boilerplate footers repeat across
    * millions of pages and survive document-level near-dup filters.
    *
    * Output: `idCol`, deduped `textCol`, `kept_lines`. Documents whose
    * every line was a repeat disappear from the output (they carry no
    * novel text).
    *
    * Scale shape: SLIM-KEY exchanges — the raw line text never crosses a
    * shuffle ([[PlanHygieneSpec]] pins it). Each occurrence maps to a
    * 32-byte `sha2(line, 256)` digest (collision-safe at any corpus size,
    * unlike a 64-bit hash whose birthday collisions at 10^10+ distinct
    * lines would silently delete innocent text); the canonical occurrence
    * per digest is a map-side-combined `min(struct(id, pos))` — a line
    * repeated 10^9 times ships one digest per input partition — and the
    * survivor positions fold to one slim `(id, sorted positions)` row per
    * document. Reassembly is ONE id equi-join back to the docs table (the
    * q59 payload-fetch shape) plus per-row `element_at` arithmetic: the
    * exchanges carry digests and integers, the document bytes ride only
    * the final join.
    */
  /** Boilerplate-LINE removal — the frequency-mode counterpart of
    * [[lineDedup]]: every non-blank line whose DISTINCT-DOCUMENT
    * frequency reaches `maxDf` is dropped from EVERY document, no
    * canonical survivor (a line on ten thousand pages is site chrome,
    * not content — keeping one copy would keep one nav menu as "text").
    * Rarer repeated lines (quotes, shared paragraphs) survive everywhere
    * — dedup them with [[lineDedup]]'s keep-first pass afterwards.
    *
    * Scale shape: same slim-key discipline as [[lineDedup]] — the
    * frequency count is a map-side-combined `count(distinct doc)` per
    * 32-byte line digest (exchange carries one (digest, id) pair per
    * distinct pair), the removal a left-anti equi-join on the digest;
    * reassembly is the same one-id-equi-join payload fetch. Documents
    * losing every line disappear.
    */
  def dropBoilerplateLines(
      docs: DataFrame,
      maxDf: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    val slim = slimLines(docs, textCol, idCol)
    val hot = slim.select(col("_d"), col(idCol)).distinct()
      .groupBy(col("_d")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= maxDf)
      .select(col("_d"))
    reassemble(docs, textCol, idCol,
      slim.join(hot, Seq("_d"), "left_anti")
        .groupBy(col(idCol))
        .agg(array_sort(collect_list(col("pos"))).as("_keep")))
  }

  def lineDedup(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val slim = slimLines(docs, textCol, idCol)
    val first = slim.groupBy(col("_d"))
      .agg(min(struct(col(idCol), col("pos"))).as("_first"))
    reassemble(docs, textCol, idCol,
      slim.join(first, "_d")
        .filter(col("_first") === struct(col(idCol), col("pos")))
        .groupBy(col(idCol))
        .agg(array_sort(collect_list(col("pos"))).as("_keep")))
  }

  /** One slim row per non-blank line occurrence: 32-byte content digest,
    * document id, 0-based line position. Everything the line-dedup family
    * shuffles — the text itself stays in the source partitions.
    */
  private def slimLines(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(trim(col("line")) =!= "")
      .select(sha2(col("line"), 256).as("_d"), col(idCol), col("pos"))

  /** Rebuild surviving documents from per-doc kept line positions
    * (`_keep`, sorted ascending): ONE id equi-join fetches each document's
    * bytes, then pure per-row arithmetic re-slices them — no text in any
    * aggregate exchange. Documents with no kept row vanish (inner join),
    * matching the "all lines were repeats" contract.
    */
  private def reassemble(
      docs: DataFrame, textCol: String, idCol: String,
      keep: DataFrame): DataFrame =
    docs.join(keep, Seq(idCol))
      .select(
        col(idCol),
        size(col("_keep")).cast("long").as("kept_lines"),
        concat_ws("\n", transform(col("_keep"),
          p => element_at(split(col(textCol), "\n"), p + 1))).as(textCol))

  /** GPT-style sequence packing: concatenate documents in a deterministic
    * order (`idCol` ascending) within each shard and slice the token stream
    * into fixed `maxTokens` windows — documents crossing a boundary are
    * split across packs, so every pack except a shard's last is exactly
    * full (the standard pretraining packing; the actual token slicing
    * happens downstream at tensor-build time, this emits the plan).
    *
    * Output: one row per (doc × pack it touches) with `pack_id` (0-based
    * within shard) and `tokens_in_pack`. Pure integer window + explode
    * arithmetic — exact, engine-independent.
    *
    * Scale shape: the cumulative sum runs per shard (`shardCols`), so at
    * 100 TB you pack within natural shards (lang, source, date...) and
    * never pay a global sort; an empty `shardCols` is a single global
    * ordering — fine for tests, not the scale path. Token counts are
    * whitespace tokens here; swap `tok` for a real tokenizer count column
    * upstream if one exists.
    */
  def packTokenSpans(
      docs: DataFrame,
      maxTokens: Int,
      shardCols: Seq[String] = Nil,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val tok = size(split(col(textCol), " ")).cast("long")
    val w = (if (shardCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(shardCols.map(col): _*))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(shardCols.map(col) ++ Seq(col(idCol), tok.as("n_tokens")): _*)
      .filter(col("n_tokens") > 0)
      .withColumn("_prev", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // the doc's token span [prev, prev + n) touches packs
      // prev div N .. (prev + n - 1) div N (integer division, inclusive)
      .withColumn("pack_id", explode(sequence(
        expr(s"_prev div $maxTokens"),
        expr(s"(_prev + n_tokens - 1) div $maxTokens"))))
      .withColumn("tokens_in_pack",
        least((col("pack_id") + 1) * maxTokens, col("_prev") + col("n_tokens")) -
          greatest(col("pack_id") * maxTokens, col("_prev")))
      .select(shardCols.map(col) ++
        Seq(col(idCol), col("pack_id"), col("tokens_in_pack"), col("n_tokens")): _*)
  }

  // ------------------------------------------------------------- text prep

  def tokens(textCol: Column): Column = split(textCol, " ")

  /** Word bigram shingles ("n-gram" units for Jaccard). */
  def bigrams(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))

  /** Word trigram shingles — more distinctive than bigrams, so LSH buckets
    * collide far less on homogeneous corpora.
    */
  def trigrams(toks: Column): Column =
    transform(sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))

  // ------------------------------------------------- near-dup: exact Jaccard

  /** Word n-gram shingle set as sorted distinct 64-bit hashes.
    *
    * Tokens are hashed once, then each shingle hash combines `n` adjacent
    * token hashes with one more `xxhash64` — the string shingle is never
    * materialized. That keeps the whole prep in cheap integer ops (~10×
    * faster than concat-then-hash: no UTF8 concat, and distinct/sort work
    * on longs), and every downstream set operation is integer-only with 3×
    * less shuffle weight than string arrays. Equality of hashed shingles
    * stands in for string equality; a false match needs two distinct
    * shingles in the SAME compared pair to collide in 64 bits
    * (P ≈ |doc|²/2⁶⁴ per pair — negligible at any corpus size).
    */
  private def tokenHashes(textCol: Column): Column =
    transform(tokens(textCol), t => xxhash64(t))

  /** `th` MUST be a materialized column (its own projection step), never the
    * `tokenHashes` expression inlined: lambda bodies are interpreted, so an
    * inlined array expression is re-evaluated on every `element_at` access —
    * O(tokens²) instead of O(tokens) (measured 20× slower).
    */
  private def ngramHashes(th: Column, n: Int): Column =
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(th) - (n - 1), lit(0))),
      i => xxhash64((0 until n).map(o => element_at(th, i + o)): _*))))

  /** Exact n-gram Jaccard near-dup within blocking buckets.
    *
    * Blocking: candidates share `lang` and sit in the same or an adjacent
    * `lengthBand`-wide length bucket. One side explodes to its 3 candidate
    * buckets, so the join is a pure EQUI join on (lang, bucket) — a shuffled
    * hash join partitioned by block key, never a theta-join and never
    * O(corpus²). Verification is engineered for homogeneous corpora where
    * candidate buckets are dense: shingles are sorted 64-bit hash arrays, so
    * `|∩|` is one allocation-free two-pointer merge
    * ([[graft.functions.SortedLongArrayIntersectCount]]) and
    * `|∪| = n_a + n_b − |∩|` — no hash sets, no second pass.
    *
    * A size prefilter (`2·min ≥ max`, necessary for J ≥ 0.5) drops pairs
    * before any array work. The threshold compare is integer-only
    * (`2·|∩| ≥ |∪|`) so engines can't disagree on float rounding.
    */
  def jaccardNearDupPairs(
      docs: DataFrame,
      lengthBand: Int = 30,
      // J ≥ simNum/simDen, kept rational so every comparison is integer-
      // exact in any engine (no double-boundary ambiguity in oracles)
      simNum: Int = 1,
      simDen: Int = 2): DataFrame = {
    require(simNum > 0 && simDen >= simNum, "threshold must be a fraction in (0, 1]")
    val prepped = docs.select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / lengthBand).as("bucket"),
      tokenHashes(col("text")).as("_th"))
      .select(col("doc_id"), col("lang"), col("bucket"), ngramHashes(col("_th"), 2).as("h"))
      .withColumn("n", size(col("h")))
    val a = prepped.select(
      col("doc_id"), col("lang"), col("h"), col("n"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
      .as("a")
    val b = prepped.as("b")
    a.join(b, col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      // J ≥ s ⟹ min(n)/max(n) ≥ s: a pure length prefilter, no pair lost
      .filter(least(col("a.n"), col("b.n")) * simDen >=
        greatest(col("a.n"), col("b.n")) * simNum)
      .select(
        col("a.lang").as("lang"),
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        graft.functions.SetFunctions.intersectCountSorted(col("a.h"), col("b.h")).as("inter"),
        (col("a.n") + col("b.n")).as("_nsum"))
      // J ≥ num/den ⟺ den|∩| ≥ num·|∪| = num·(n_a+n_b−|∩|)
      //            ⟺ (den+num)|∩| ≥ num·(n_a+n_b). The last form references
      // the intersect ONCE, so when Catalyst substitutes it into the join
      // condition, each candidate pair pays one merge, not two — and pairs
      // failing it never materialize as join output rows.
      .filter(col("inter") * (simDen + simNum) >= col("_nsum") * simNum)
      .select(col("lang"), col("id_a"), col("id_b"),
        col("inter"), (col("_nsum") - col("inter")).as("uni"))
  }

  /** Edit-distance (Levenshtein) near-dup pairs — the character-level
    * member of the dedup family, for short-to-medium fields where token
    * shingles are too coarse. Blocking mirrors [[jaccardNearDupPairs]]:
    * same `lang` and a character-length bucket within the sound reach
    * (distance ≥ |len_a − len_b|) — a pure equi-join, never O(n²), with no
    * within-threshold pair missed. The distance itself uses Spark's
    * banded `levenshtein(l, r, threshold)` (O(len·k), −1 when exceeded),
    * so non-matches quit early instead of filling the full matrix.
    */
  def editDistanceNearDupPairs(
      docs: DataFrame,
      maxDistance: Int = 30,
      lengthBand: Int = 10): DataFrame = {
    // distance ≥ |len_a − len_b|, so a within-threshold pair sits at most
    // ⌈maxDistance/lengthBand⌉ length buckets apart — explode exactly that
    // reach so the blocking is SOUND (no within-threshold pair is missed)
    val reach = math.ceil(maxDistance.toDouble / lengthBand).toInt
    // SLIM-KEY candidate generation (the repo's dedup convention): the
    // exploded blocking join carries (id, lang, length) tuples ONLY —
    // never document text — so the self-join shuffle is a few bytes per
    // candidate instead of two full texts. Candidates then fetch their
    // payloads back by plain id equi-joins (the lshAnnPairs /
    // semanticDedupPairs shape): each side of the fetch shuffles only the
    // slim candidate keys plus one copy of each REFERENCED document — no
    // driver-side materialization of the corpus, so the operator scales
    // with the candidate set, not with |docs|.
    val d = docs.select(
      col("doc_id"), col("lang"), length(col("text")).as("_len"),
      floor(length(col("text")) / lengthBand).as("_b"))
    val a = d.select(
      col("doc_id").as("id_a"), col("lang"), col("_len").as("_la"),
      explode(array((-reach to reach).map(o => col("_b") + o): _*)).as("_b"))
    val b = d.select(
      col("doc_id").as("id_b"), col("lang"), col("_len").as("_lb"), col("_b"))
    val cand = a.join(b, Seq("lang", "_b"))
      .filter(col("id_a") < col("id_b"))
      // distance >= |len_a − len_b|: an exact integer prefilter on the
      // slim tuples, before any payload is fetched
      .filter(abs(col("_la") - col("_lb")) <= lit(maxDistance))
      .select(col("lang"), col("id_a"), col("id_b"))
    // payload lookup: text + SORTED codepoint bag (for the bag
    // lower bound below), computed once per document
    val payload = docs.select(
      col("doc_id"), col("text"),
      array_sort(transform(split(col("text"), ""),
        c => ascii(c).cast("long"))).as("_cs"))
    cand
      .join(payload.select(col("doc_id").as("id_a"),
        col("text").as("_ta"), col("_cs").as("_csa")), Seq("id_a"))
      .join(payload.select(col("doc_id").as("id_b"),
        col("text").as("_tb"), col("_cs").as("_csb")), Seq("id_b"))
      // SOUND character-bag prefilter: edit distance >= max(|a|,|b|) −
      // |bag(a) ∩ bag(b)| (at best every common-bag character survives;
      // every remaining position of the longer string needs an edit).
      // The codegen'd two-pointer multiset merge is O(|a|+|b|) per pair
      // vs the bounded Levenshtein's O(len·maxDistance), and within-
      // threshold pairs always pass (lower bound) — result set unchanged.
      .filter(
        greatest(length(col("_ta")), length(col("_tb"))) -
          graft.functions.SetFunctions.intersectCountSorted(col("_csa"), col("_csb"))
          <= lit(maxDistance))
      .withColumn("dist", levenshtein(col("_ta"), col("_tb"), maxDistance))
      .filter(col("dist") >= 0)
      .select(col("lang"), col("id_a"), col("id_b"), col("dist"))
  }

  /** Shared trigram-shingle prep for [[minhashNearDupPairs]] /
    * [[trigramJaccardPairs]]: `(doc_id, lang, h)` with `h` the sorted
    * distinct hashed-trigram set. Callers running BOTH operators over the
    * same corpus should `.persist()` this and pass it to the
    * `...FromShingles` variants — the prep is the expensive scalar work and
    * otherwise re-evaluates once per plan subtree.
    */
  def trigramShingles(docs: DataFrame): DataFrame = docs
    .filter(size(split(col("text"), " ")) >= 3)
    .select(col("doc_id"), col("lang"), tokenHashes(col("text")).as("_th"))
    .select(col("doc_id"), col("lang"), ngramHashes(col("_th"), 3).as("h"))

  /** Exact trigram-Jaccard pair set over lang-blocked ALL-pairs — the
    * verification baseline for [[minhashNearDupPairs]]: same shingle space
    * (hashed trigrams), same distance expression, no LSH and no length
    * blocking, so `minhash ⊆ this` holds exactly and recall is measurable.
    * O(n²) within a language — a QA/verification utility, not the scale
    * path (that is [[minhashNearDupPairs]] / [[jaccardNearDupPairs]]).
    */
  def trigramJaccardPairs(docs: DataFrame, jaccardDistThreshold: Double = 0.6): DataFrame =
    trigramJaccardPairsFromShingles(trigramShingles(docs), jaccardDistThreshold)

  def trigramJaccardPairsFromShingles(
      shingles: DataFrame, jaccardDistThreshold: Double = 0.6): DataFrame = {
    val prepped = shingles.withColumn("n", size(col("h")))
    val maxJ = 1.0 - jaccardDistThreshold
    // necessary size condition: J ≤ min/max, so J ≥ maxJ needs
    // min ≥ maxJ·max — an integer prefilter that skips the array merge for
    // the vast majority of pairs (×5 on the homogeneous test corpus)
    val (num, den) = { val d = BigDecimal(maxJ); ((d * 1000).toInt, 1000) }
    // `lang` alone has a handful of distinct values, so a lang-keyed
    // self-join would run on that many reducers no matter the cluster. Grid
    // salting restores parallelism: side b carries its hash bucket, side a
    // replicates over all `buckets` targets, the join key becomes
    // (lang, bucket) — every pair still matches exactly once, on
    // |langs|·buckets reducers.
    val buckets = 16
    // repartition the replicated probe side: with a broadcast build the
    // probe otherwise inherits the SOURCE's split count (a single-row-group
    // file probes on one task no matter how many cores exist) — the O(n²)
    // merge work must spread over the (lang, grid-bucket) cells
    val a = prepped.withColumn("_gb", explode(array((0 until buckets).map(lit): _*)))
      .repartition(col("lang"), col("_gb"))
    val b = prepped.withColumn("_gb", pmod(hash(col("doc_id")), lit(buckets)))
    a.as("a").join(b.as("b"),
        col("a.lang") === col("b.lang") && col("a._gb") === col("b._gb") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(least(col("a.n"), col("b.n")) * den >= greatest(col("a.n"), col("b.n")) * num)
      .select(
        col("a.lang").as("lang"),
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        graft.functions.SetFunctions.intersectCountSorted(col("a.h"), col("b.h")).as("_inter"),
        (col("a.n") + col("b.n")).as("_nsum"))
      .select(col("lang"), col("id_a"), col("id_b"),
        (lit(1.0) - col("_inter").cast("double") /
          (col("_nsum") - col("_inter")).cast("double")).as("jaccard_dist"))
      .filter(col("jaccard_dist") <= jaccardDistThreshold)
  }

  // ---------------------------------------------------- near-dup: MinHash LSH

  /** MinHash+LSH near-dup candidate pairs (approx Jaccard), the scale path:
    * shingle → b·r seeded min-hashes → band signatures → bucket equi-join →
    * exact-Jaccard verification of the (few) candidates. Hand-rolled in
    * `functions._` rather than `MinHashLSH`: every stage stays inside
    * whole-stage codegen, shuffle rows are (id, band-sig) slim instead of
    * ML sparse vectors, and results are seed-deterministic.
    *
    * A pair becomes a candidate when all `rowsPerBand` min-hashes agree in
    * at least one of `numBands` bands — P(candidate) = 1-(1-J^r)^b, the
    * classic S-curve. Candidates are verified with the exact hashed-shingle
    * Jaccard, so false positives never reach the output.
    */
  def minhashNearDupPairs(
      docs: DataFrame,
      jaccardDistThreshold: Double = 0.6,
      numBands: Int = 4,
      rowsPerBand: Int = 2): DataFrame =
    // trigram shingles: distinctive enough that LSH buckets stay small even
    // when the corpus shares most of its vocabulary
    // the no-shingle filter runs on the cheap token count BEFORE the prep:
    // filtering on size(h) would be predicate-pushed into the scan with the
    // whole (inlined, quadratic) shingle expression substituted in
    minhashNearDupPairsFromShingles(
      trigramShingles(docs), jaccardDistThreshold, numBands, rowsPerBand)

  def minhashNearDupPairsFromShingles(
      shingles: DataFrame,
      jaccardDistThreshold: Double = 0.6,
      numBands: Int = 4,
      rowsPerBand: Int = 2): DataFrame = {
    val prepped = shingles
    // all band signatures in ONE fused codegen'd pass
    // ([[graft.functions.MinHashBandSigs]]): bit-identical to the
    // array_min(transform(h, x -> xxhash64(x, k))) + band-xxhash64 HOF
    // composition (equivalence property-pinned in MinHashSpec), without
    // materializing numBands x rowsPerBand intermediate arrays per row
    val bandSigs = graft.functions.MinHash
      .minhashBandSigs(col("h"), numBands, rowsPerBand)
    // Signature rows are SLIM (doc_id, lang, band, sig) — the shingle
    // arrays stay out of the band join entirely. At 100 TB the arrays are
    // the data: keeping them off the exploded (×numBands) join and off the
    // collapse exchange is the difference between shuffling ids and
    // shuffling the corpus. Blocking by lang keeps buckets mono-lingual
    // and smaller.
    val sigs = prepped.select(col("doc_id"), col("lang"),
      posexplode(bandSigs).as(Seq("band", "sig")))
    val cand = sigs.as("a")
      .join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.lang").as("lang"),
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      // a pair matching in k bands appears k times — dedup on the slim keys
      // BEFORE any array is fetched (the exchange carries 3 scalars per row)
      .distinct()
    // fetch shingle arrays for the (few) candidates with two id-keyed hash
    // joins — each array crosses the wire exactly once per side
    val ha = prepped.select(col("doc_id").as("id_a"), col("h").as("ha"))
    val hb = prepped.select(col("doc_id").as("id_b"), col("h").as("hb"))
    cand.join(ha, "id_a").join(hb, "id_b")
      .withColumn("_inter",
        graft.functions.SetFunctions.intersectCountSorted(col("ha"), col("hb")))
      .select(
        col("lang"), col("id_a"), col("id_b"),
        (lit(1.0) - col("_inter").cast("double") /
          (size(col("ha")) + size(col("hb")) - col("_inter")).cast("double")).as("jaccard_dist"))
      .filter(col("jaccard_dist") <= jaccardDistThreshold)
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash over token sets: per-token xxhash64, ±1 bit votes,
    * sign → bit — one fused codegen'd loop per row
    * ([[graft.functions.SimHash64]]; the earlier `aggregate`/`zip_with`
    * formulation paid O(tokens × 64) interpreted lambda calls per doc).
    */
  def withSimhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("simhash",
      graft.functions.SimHash.simhash64(array_distinct(tokens(col(textCol)))))

  // ------------------------------------------ similarity search (embeddings)

  private[operators] def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sort key for deterministic quantizer-fit samples: hash first (an
    * unbiased draw from the whole corpus — `orderBy(id).limit(n)` would
    * take the oldest shard / one domain of a 100 TB table), id second (a
    * total order, so the sample is bit-reproducible run to run).
    */
  private[graft] def fitSampleOrder(id: Column): Seq[Column] = Seq(xxhash64(id), id)

  private[operators] def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  /** Cosine similarity over `array<double>` columns. The three inner
    * products are fused codegen'd loops ([[graft.functions.DoubleArrayDotProduct]]),
    * not interpreted `aggregate(zip_with(...))` chains — this is the hot
    * loop of every brute-force scoring stage.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-k: the exactness baseline. The probe side is
    * broadcast; the corpus side never shuffles for scoring — each partition
    * scores its rows locally, then the per-probe top-k is a map-side-partial
    * [[graft.functions.TopKByScore]] aggregate: only k rows per task per
    * probe reach the exchange, not the full corpus × probes score matrix
    * (a `Window.partitionBy(probe)` would shuffle every scored pair).
    */
  def cosineTopK(embeddings: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    // spreadIfNarrow (r19): the corpus side of the broadcast-NL scorer
    // inherits the SCAN's working-task count — a single-row-group file
    // runs the whole probes x corpus cosine pass on one core (profiled:
    // 800 ms single-task job inside q114). TopK's ordering is total
    // (score desc, id asc), so the repartition cannot change results.
    val corpus = spreadIfNarrow(embeddings).select(
      col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("n_emb"))
    val probe = probes.select(
      col("vec_id").as("probe_id"), asDouble(col("embedding")).as("p_emb"))
    val scored = corpus.join(broadcast(probe), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosine(col("p_emb"), col("n_emb")).as("cos_sim"))
    rankTopK(scored, k)
  }

  /** (probe_id, neighbor_id, cos_sim) → per-probe (rank ≤ k) via the
    * map-side-partial top-k aggregate.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("probe_id"))
      .agg(graft.functions.TopK.topKByScore(k, col("cos_sim"), col("neighbor_id")).as("top"))
      .select(col("probe_id"), posexplode(col("top")))
      .select(col("probe_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos_sim"))

  /** LSH-bucketed ANN (the 100 TB path): normalize → random-projection
    * buckets → bucket equi-join → exact-cosine verification. Hand-rolled in
    * `functions._` (no MLlib): seeded hyperplanes are plan literals, shuffle
    * keys are slim `(table, bucket)` ints, results are deterministic, and
    * nothing drags a UDF chain into scan-level filters.
    *
    * Per table `t`, a vector lands in bucket `⌊⟨unit(v), r_t⟩ / bucketLength⌋`
    * (`r_t` seeded gaussian). The probe side explodes to buckets ±1 (multi-
    * probe), so near-boundary neighbors aren't lost; candidates = bucket
    * matches in ANY table, verified with exact cosine before output. Never a
    * cartesian — candidate volume is governed by `numTables × bucketLength`.
    *
    * Zero vectors produce NaN cosines and are dropped by the `≥ minCosine`
    * verification, never an error.
    *
    * Cache lifecycle: the slim normalized `(id, u)` projections are
    * `persist()`ed (each feeds bucket keys AND verification — without the
    * barrier both branches re-scan and re-normalize the source). Spark
    * offers no completion hook a transform could free them on, so they
    * stay cached until the caller's `spark.catalog.clearCache()` (what
    * Verify/Bench do between queries) or session end — one slim projection
    * per input per call. Long-lived sessions composing many ANN calls
    * should use [[lshAnnPairsWithHandle]] and `close()` the handle after
    * consuming each result, freeing the caches per-call.
    */
  def lshAnnPairs(
      embeddings: DataFrame,
      probes: DataFrame,
      minCosine: Double,
      numTables: Int = 4,
      bucketLength: Double = 0.5,
      dim: Int = -1): DataFrame =
    lshAnnPairsWithHandle(embeddings, probes, minCosine, numTables, bucketLength, dim)._1

  /** [[lshAnnPairs]] plus the lifecycle handle over the slim `(id, u)`
    * caches the call pins — `close()` it once the returned DataFrame's
    * actions have completed (closing earlier forces downstream stages to
    * recompute the normalization, costing correctness nothing but paying
    * the extra scans back).
    */
  def lshAnnPairsWithHandle(
      embeddings: DataFrame,
      probes: DataFrame,
      minCosine: Double,
      numTables: Int = 4,
      bucketLength: Double = 0.5,
      dim: Int = -1): (DataFrame, AnnCacheHandle) = {
    // The seeded hyperplanes need the embedding width. Callers that know it
    // (schema docs, table metadata) pass it and the whole operator stays a
    // lazy plan; `dim < 0` falls back to a one-row probe job — an interactive
    // convenience that breaks lazy composition, never the scale path.
    val d = if (dim > 0) dim else embeddings.select(size(col("embedding"))).head().getInt(0)
    val rnd = new scala.util.Random(42)
    val planes: Seq[Seq[Double]] = Seq.fill(numTables)(Seq.fill(d)(rnd.nextGaussian()))

    // id + unit vector — u materialized in its own projection so downstream
    // expressions reference it, not recompute it
    def normed(df: DataFrame, idAs: String): DataFrame = df
      .select(col("vec_id").as(idAs), asDouble(col("embedding")).as("_v"))
      .withColumn("_norm", sqrt(dot(col("_v"), col("_v"))))
      .select(col(idAs), transform(col("_v"), x => x / col("_norm")).as("u"))

    // Normalize ONCE per input: the slim (id, u) projection is persisted and
    // feeds both the bucket keys and the exact-cosine verification join —
    // without the barrier each downstream branch re-scans the source and
    // re-pays the sqrt/divide pass (two extra full corpus scans at 100 TB).
    // Self-join callers (embedding near-dup) share a single cache.
    val selfJoin = probes eq embeddings
    val corpusU = normed(embeddings, "neighbor_id").persist()
    val probeU =
      if (selfJoin) corpusU.select(col("neighbor_id").as("probe_id"), col("u"))
      else normed(probes, "probe_id").persist()

    def bucketed(df: DataFrame): DataFrame =
      planes.zipWithIndex.foldLeft(df) { case (acc, (r, t)) =>
        acc.withColumn(s"_p$t",
          floor(dot(col("u"), array(r.map(lit): _*)) / bucketLength).cast("int"))
      }

    def key(t: Int, bucket: Column): Column =
      struct(lit(t).as("t"), bucket.as("b"))

    // Bucket rows are SLIM (id, key) — unit vectors stay out of the exploded
    // bucket join and the candidate-dedup exchange; candidates re-join the
    // vectors by id afterwards, so each vector crosses the wire once.
    val corpusKeys = bucketed(corpusU)
      .withColumn("key", explode(array((0 until numTables).map(t => key(t, col(s"_p$t"))): _*)))
      .select(col("neighbor_id"), col("key"))
    val probeKeys = bucketed(probeU)
      .withColumn("key", explode(array((0 until numTables).flatMap(t =>
        Seq(-1, 0, 1).map(dd => key(t, col(s"_p$t") + dd))): _*)))
      .select(col("probe_id"), col("key"))

    val cand = probeKeys.join(corpusKeys,
        probeKeys("key") === corpusKeys("key") && col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))
      // a pair colliding in k tables appears k times — dedup on slim id keys
      .distinct()
    val pu = probeU.select(col("probe_id"), col("u").as("pu"))
    val nu = corpusU.select(col("neighbor_id"), col("u").as("nu"))
    val result = cand.join(pu, "probe_id").join(nu, "neighbor_id")
      .select(col("probe_id"), col("neighbor_id"),
        dot(col("pu"), col("nu")).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
    val pinned = if (selfJoin) Seq(corpusU) else Seq(corpusU, probeU)
    (result, new AnnCacheHandle(pinned))
  }

  /** Embedding-cosine near-dup: semantic-duplicate pairs with
    * `cos(a,b) ≥ minCosine`, the embedding member of the dedup family.
    * Candidates come from the same random-projection LSH buckets as
    * [[lshAnnPairs]] (self-join form), then exact cosine verification —
    * never an all-pairs cartesian. Emits each unordered pair once
    * (`id_a < id_b`).
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame, minCosine: Double = 0.9, dim: Int = -1): DataFrame =
    embeddingNearDupPairsWithHandle(embeddings, minCosine, dim)._1

  /** [[embeddingNearDupPairs]] plus the cache lifecycle handle (see
    * [[lshAnnPairsWithHandle]]).
    */
  def embeddingNearDupPairsWithHandle(
      embeddings: DataFrame,
      minCosine: Double = 0.9,
      dim: Int = -1): (DataFrame, AnnCacheHandle) = {
    val (pairs, handle) = lshAnnPairsWithHandle(embeddings, embeddings, minCosine, dim = dim)
    val result = pairs
      .filter(col("probe_id") < col("neighbor_id"))
      .select(col("probe_id").as("id_a"), col("neighbor_id").as("id_b"), col("cos_sim"))
    (result, handle)
  }

  /** SemDeDup-style semantic dedup pairs: k-means-cluster the unit
    * embeddings (bounded-sample fit, the same coarse-quantizer recipe as
    * [[ivfAnnTopK]]), then compare pairs ONLY within a cluster with exact
    * cosine. Where [[embeddingNearDupPairs]] buckets by seeded random
    * projections, the clustered form is the published SemDeDup shape:
    * per-cluster locality, work bounded by `Σ cluster_size²` instead of
    * corpus², and recall traded only at cluster boundaries — recovered by
    * assigning each vector to its `nAssign` nearest clusters (the IVF
    * multi-probe idea). Candidates flow as slim `(id, cluster)` keys and
    * vectors are fetched back by id, so each vector crosses the wire
    * once. Emits each unordered pair once (`id_a < id_b`); zero vectors
    * are dropped (no cosine). The slim unit-vector projection is
    * persisted (fit sample + assignment + verification reuse it); free it
    * via the [[semanticDedupPairsWithHandle]] handle or
    * `spark.catalog.clearCache()`.
    */
  def semanticDedupPairs(
      embeddings: DataFrame,
      minCosine: Double = 0.9,
      nClusters: Int = 16): DataFrame =
    semanticDedupPairsWithHandle(embeddings, minCosine, nClusters)._1

  /** [[semanticDedupPairs]] plus the cache lifecycle handle (see
    * [[lshAnnPairsWithHandle]]).
    */
  def semanticDedupPairsWithHandle(
      embeddings: DataFrame,
      minCosine: Double = 0.9,
      nClusters: Int = 16,
      nAssign: Int = 2): (DataFrame, AnnCacheHandle) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(nClusters >= 2, s"nClusters must be >= 2, got $nClusters")
    require(nAssign >= 1 && nAssign <= nClusters,
      s"nAssign must be in [1, $nClusters], got $nAssign")
    val vecs = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("_v"))
      .withColumn("_norm", sqrt(dot(col("_v"), col("_v"))))
      .filter(col("_norm") > 0.0)
      .select(col("vec_id"), transform(col("_v"), x => x / col("_norm")).as("u"))
      .persist()
    // random init + few iterations, fit on a bounded sample: the clusters
    // only need to partition the space (see ivfAnnTopK's rationale)
    val km = new KMeans().setK(nClusters).setSeed(42).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cluster_id")
    // orderBy-before-limit makes the fit sample (and so the trained
    // centroids and the emitted pair set) independent of partition layout:
    // a bare limit() takes whichever partitions answer first, so the same
    // data could cluster differently under different parallelism. The sort
    // is a distributed top-k (TakeOrderedAndProject), not a global sort.
    val model = km.fit(
      vecs.orderBy(col("vec_id")).limit(256 * nClusters)
        .select(array_to_vector(col("u")).as("features")))
    // multi-assignment (each vector joins its nAssign nearest clusters, the
    // IVF multi-probe idea): pairs straddling one boundary still meet in
    // the neighbor cluster. Ranking is per-row array arithmetic over the
    // literal centroid table — no window, no shuffle.
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cid"), array(c.toArray.map(lit).toIndexedSeq: _*).as("c"))
    }
    // slim (vec_id, cluster_id) — vectors stay OUT of the candidate join
    // and are fetched back by id, exactly lshAnnPairs' shuffle shape
    val assigned = vecs
      .withColumn("_ranked", array_sort(transform(array(centroids.toIndexedSeq: _*),
        ct => struct((lit(0.0) - dot(col("u"), ct.getField("c"))).as("negdot"),
          ct.getField("cid").as("cid")))))
      .select(col("vec_id"),
        explode(slice(col("_ranked"), 1, nAssign)).as("_best"))
      .select(col("vec_id"), col("_best.cid").as("cluster_id"))
    val cand = assigned.select(col("cluster_id"), col("vec_id").as("id_a"))
      .join(assigned.select(col("cluster_id"), col("vec_id").as("id_b")), Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      // a pair sharing both probed clusters appears twice — dedup slim keys
      .distinct()
    val ua = vecs.select(col("vec_id").as("id_a"), col("u").as("_ua"))
    val ub = vecs.select(col("vec_id").as("id_b"), col("u").as("_ub"))
    val pairs = cand.join(ua, "id_a").join(ub, "id_b")
      .select(col("id_a"), col("id_b"), dot(col("_ua"), col("_ub")).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
    (pairs, new AnnCacheHandle(Seq(vecs)))
  }

  /** Int8 (default) scalar quantization of an embedding column — the
    * storage-budget member of the similarity family: a 100 TB float32
    * corpus stores as ~25 TB of `array<tinyint>` plus one float scale per
    * vector. Per-vector symmetric scheme: `scale = maxAbs / (2^(bits-1)-1)`,
    * `q_i = round(v_i / scale)` — so every element reconstructs within
    * `scale/2` and COSINE similarity is preserved up to quantization noise
    * (the per-vector scale cancels in the cosine, so ANN can score the int
    * arrays directly). All higher-order functions — codegen'd, no UDFs,
    * no shuffle (embarrassingly row-parallel at any scale). Zero vectors
    * quantize to all-zero with scale 0, never a NaN.
    */
  def quantizeEmbeddings(
      emb: DataFrame, embCol: String = "embedding", bits: Int = 8): DataFrame = {
    require(bits >= 2 && bits <= 16, s"bits must be in [2,16], got $bits")
    val qmax = (1 << (bits - 1)) - 1
    val storageType = if (bits <= 8) "tinyint" else "smallint"
    val v = asDouble(col(embCol))
    emb
      .withColumn("q_scale",
        aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / qmax)
      .withColumn("q_embedding",
        when(col("q_scale") === 0.0,
          transform(v, _ => lit(0).cast(storageType)))
          .otherwise(transform(v, x => round(x / col("q_scale")).cast(storageType))))
  }

  /** Reconstruct `array<double>` from a quantized embedding + its scale. */
  def dequantizeEmbedding(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** IVF-style ANN: k-means coarse quantizer → inverted lists → probe the
    * `nProbe` nearest lists only. The corpus is partitioned by list id (an
    * equi-join key — at scale the lists would be bucketed on disk), probes
    * are broadcast; scoring is brute-force cosine but only inside probed
    * lists, so work is `corpus/nLists × nProbe` per probe, never a cartesian.
    */
  def ivfAnnTopK(
      embeddings: DataFrame,
      probes: DataFrame,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // Train the coarse quantizer on a bounded sample, as any real IVF build
    // does — k-means over the full corpus would be an O(corpus × iters)
    // driver-coordinated job at 100 TB. 256 points per list is plenty for a
    // stable coarse partitioning; assignment below still covers every row.
    // Deterministic, unbiased sample ([[fitSampleOrder]]): hash-ordered
    // top-k — bit-reproducible like an id-ordered limit, but drawing evenly
    // across the id space instead of favoring the oldest shard. The fit is
    // the PQ family's LOCAL Lloyd ([[lloydFit]]): a coarse quantizer only
    // partitions the space, and 5 local iterations over a ≤256·nLists
    // sample cost microseconds where an MLlib fit pays per-iteration
    // scheduler rounds (the bench's former q43 floor).
    val samplePts = embeddings
      .orderBy(fitSampleOrder(col("vec_id")): _*)
      .limit(256 * nLists)
      .select(asDouble(col("embedding")))
      .collect().map(_.getSeq[Double](0).toArray)
    val cents: Array[Array[Double]] = lloydFit(samplePts, nLists, iters = 5)

    // corpus assignment: per-row codegen'd argmin over the literal
    // centroid table — argmin_c ||x−c||² = argmin_c (|c|² − 2⟨x,c⟩),
    // struct sort breaks ties toward the lower list id. No MLlib vector
    // conversion, no fit job, one projection over the corpus.
    val corpus0 = embeddings.select(
      col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("n_emb"))
    val assignStructs = cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      val cArr = array(c.map(lit).toIndexedSeq: _*)
      val cNorm = c.map(x => x * x).sum
      struct((dot(col("n_emb"), cArr) * lit(-2.0) + lit(cNorm)).as("d"),
        lit(i).as("list_id"))
    }
    val corpus = corpus0
      .withColumn("list_id",
        element_at(array_sort(array(assignStructs: _*)), 1).getField("list_id"))
      .select(col("neighbor_id"), col("n_emb"), col("list_id"))

    // centroids as a literal lookup: tiny (nLists × dim), evaluated per probe
    val centroids = cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("list_id"), array(c.map(lit).toIndexedSeq: _*).as("c"))
    }
    val probePrepped = probes.select(
      col("vec_id").as("probe_id"), asDouble(col("embedding")).as("p_emb"))
      .withColumn("cent", explode(array(centroids.toIndexedSeq: _*)))
      // d²(p,c) = ⟨p,p⟩ − 2⟨p,c⟩ + ⟨c,c⟩, all fused codegen'd dots
      .withColumn("cent_dist",
        dot(col("p_emb"), col("p_emb")) - lit(2.0) * dot(col("p_emb"), col("cent.c")) +
          dot(col("cent.c"), col("cent.c")))
    val wProbe = Window.partitionBy(col("probe_id")).orderBy(col("cent_dist"), col("cent.list_id"))
    val probeLists = probePrepped
      .withColumn("cent_rank", row_number().over(wProbe))
      .filter(col("cent_rank") <= nProbe)
      .select(col("probe_id"), col("p_emb"), col("cent.list_id").as("list_id"))

    val scored = corpus.join(broadcast(probeLists), Seq("list_id"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosine(col("p_emb"), col("n_emb")).as("cos_sim"))
    // map-side-partial top-k: k rows per task per probe reach the shuffle
    rankTopK(scored, k)
  }

  // -------------------------------------------------- product quantization

  /** Deterministic local Lloyd's k-means over a driver-side sample (the
    * quantizer-training step of [[pqAnnTopK]]). PQ codebooks train on a
    * BOUNDED sample in every real system (a few thousand vectors suffice
    * for 8-dim subspaces); doing it in plain Scala avoids m MLlib fit
    * jobs' scheduler overhead and is exactly reproducible: init picks
    * evenly-spaced points of the (id-ordered) sample, ties in assignment
    * break toward the lower centroid id, empty clusters keep their
    * previous centroid.
    */
  private[operators] def lloydFit(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val n = points.length
    require(n > 0, "pq: empty training sample")
    val ds = points(0).length
    val kk = math.min(k, n)
    val stride = math.max(1, n / kk)
    var centroids = Array.tabulate(kk)(i => points((i * stride) % n).clone())
    // pad (degenerate n < k) by repeating the first point
    if (centroids.length < k)
      centroids = centroids ++ Array.fill(k - centroids.length)(points(0).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](ds))
      val counts = new Array[Long](k)
      var p = 0
      while (p < n) {
        val x = points(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          val cc = centroids(c)
          while (j < ds) { val t = x(j) - cc(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < ds) { sums(best)(j) += x(j); j += 1 }
        counts(best) += 1
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < ds) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** Train PQ codebooks: `m` subspaces × `codes` centroids × (dim/m) dims,
    * fit on a deterministic HASH-ordered sample of `sampleN` vectors
    * ([[fitSampleOrder]]) — bit-reproducible like an id-ordered limit, but
    * not biased toward the oldest ids (on a 100 TB corpus the first ids
    * are one shard / one domain; a hash order is an unbiased draw).
    */
  def pqCodebooks(
      embeddings: DataFrame,
      dim: Int,
      m: Int,
      codes: Int,
      sampleN: Int = 4096): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"pq: dim $dim must divide into $m subspaces")
    val ds = dim / m
    val sample = embeddings
      .orderBy(fitSampleOrder(col("vec_id")): _*)
      .limit(sampleN)
      .select(asDouble(col("embedding")))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    Array.tabulate(m) { i =>
      lloydFit(sample.map(v => java.util.Arrays.copyOfRange(v, i * ds, (i + 1) * ds)), codes, iters = 10)
    }
  }

  /** Encode an `array<double>` embedding column into `pq_codes`
    * (`array<int>`, one code per subspace — m bytes of storage per vector
    * against 4·dim float32, e.g. 32× smaller at dim=64, m=8) plus
    * `pq_norm` (the EXACT norm of the reconstruction, derivable from the
    * codes alone because subspaces are disjoint). Everything is codegen'd
    * array arithmetic over literal codebooks — no UDF, no shuffle.
    */
  def pqEncode(df: DataFrame, cb: Array[Array[Array[Double]]], embCol: String): DataFrame = {
    // one fused codegen'd pass per row (graft.functions.PqEncodeVector) —
    // argmin_c ||s − cb_ic||² = argmin_c (|cb_ic|² − 2⟨s, cb_ic⟩), strict <
    // keeps the LOWEST code on ties; |x̂|² = Σ_i |cb_i(code_i)|² exactly
    // (disjoint subspaces). Bit-identical to the bounded-HOF formulation
    // it replaced (spec-pinned), minus the interpreted argmin folds that
    // Catalyst re-inlined into the dependent pq_norm column — the encode
    // stage was the dominant per-row CPU of every PQ query.
    val enc = graft.functions.PqEncodeVector.pqEncodeStruct(asDouble(col(embCol)), cb)
    df.withColumn("pq_codes", enc.getField("codes"))
      .withColumn("pq_norm", enc.getField("norm"))
  }

  /** PQ ANN with asymmetric distance computation (ADC) + exact re-rank:
    * the third member of the similarity family ([[lshAnnPairs]] buckets,
    * [[ivfAnnTopK]] partitions, this COMPRESSES). Corpus vectors live as
    * m small codes; each probe precomputes one m×codes lookup table of
    * partial dot products, so scoring a corpus row costs m table lookups
    * instead of dim multiplications (8 vs 64 at the defaults) — the 100 TB
    * path stores only `pq_codes` + id and never materializes float vectors
    * for the scored set. The top `k·refineFactor` ADC candidates are then
    * re-scored exactly (a slim id-join fetches just those vectors), the
    * standard two-stage PQ retrieval that restores recall lost to
    * quantization while bounding exact work to `probes × k·refineFactor`.
    */
  def pqAnnTopK(
      embeddings: DataFrame,
      probes: DataFrame,
      k: Int,
      dim: Int,
      m: Int = 8,
      codes: Int = 16,
      sampleN: Int = 4096,
      refineFactor: Int = 4,
      codebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    require(dim % m == 0, s"pq: dim $dim must divide into $m subspaces")
    val ds = dim / m
    val cb = codebooks.getOrElse(pqCodebooks(embeddings, dim, m, codes, sampleN))
    require(cb.length == m && cb.forall(_.length == codes),
      "pq: supplied codebooks must be m x codes")
    // sub-dimension must match the probe-side slice width, or the ADC LUT
    // pairs misaligned sub-vectors and the shortlist silently degrades
    // (the exact re-rank keeps returned scores right, hiding the bug)
    require(cb(0)(0).length == ds,
      s"pq: codebook sub-dimension ${cb(0)(0).length} != dim/m = $ds")
    // spreadIfNarrow (r19): the per-query encode + ADC pass inherits the
    // corpus scan's working-task count (profiled: a 370 ms single-task
    // job inside q104 on a single-row-group corpus file)
    val corpus = pqEncode(
      spreadIfNarrow(embeddings)
        .select(col("vec_id").as("neighbor_id"), asDouble(col("embedding")).as("n_emb")),
      cb, "n_emb")
      .select(col("neighbor_id"), col("pq_codes"), col("pq_norm"))
    pqAdcRerank(corpus, embeddings, probes, cb, k, refineFactor)
  }

  /** ADC scoring + exact re-rank over an ALREADY-ENCODED corpus
    * (`neighbor_id`, `pq_codes`, `pq_norm`) — the shared back half of
    * [[pqAnnTopK]] (inline encode) and [[PqIndex.topK]] (codes read back
    * from the persisted index table, no encode in the plan).
    */
  private[operators] def pqAdcRerank(
      corpus: DataFrame,
      embeddings: DataFrame,
      probes: DataFrame,
      cb: Array[Array[Array[Double]]],
      k: Int,
      refineFactor: Int): DataFrame = {
    val m = cb.length
    val codes = cb(0).length
    val ds = cb(0)(0).length
    val p = asDouble(col("embedding"))
    // flat literal codebook + one HOF pass builds the m×codes LUT (same
    // plan-size rationale as pqEncode)
    val cbFlat = typedlit(
      (0 until m).flatMap(i => (0 until codes).map(c => cb(i)(c).toIndexedSeq)).toIndexedSeq)
    val probe = probes.select(
      col("vec_id").as("probe_id"),
      p.as("p_emb"),
      transform(sequence(lit(0), lit(m * codes - 1)), j => {
        val sub = floor(j.cast("double") / codes).cast("int")
        dot(slice(p, sub * ds + 1, lit(ds)), element_at(cbFlat, j + 1))
      }).as("lut"),
      sqrt(dot(p, p)).as("p_norm"))
    val adcDot = (0 until m).map(i =>
      element_at(col("lut"), lit(i * codes + 1) + element_at(col("pq_codes"), i + 1)))
      .reduce(_ + _)
    // an IVF-routed corpus arrives pre-paired (probe_id already attached
    // by the probed-list join), so each row scores against ITS probe only;
    // a flat corpus crosses every probe with every code row
    val paired =
      if (corpus.columns.contains("probe_id"))
        corpus.join(broadcast(probe), Seq("probe_id"))
          .filter(col("probe_id") =!= col("neighbor_id"))
      else corpus.join(broadcast(probe), col("probe_id") =!= col("neighbor_id"))
    val adc = paired
      .select(col("probe_id"), col("neighbor_id"),
        when(col("p_norm") * col("pq_norm") === 0.0, lit(0.0))
          .otherwise(adcDot / (col("p_norm") * col("pq_norm"))).as("cos_sim"))
    // distinct: a persisted-index corpus can briefly hold duplicate rows
    // per id (e.g. between a compaction and its index refresh) — the
    // shortlist is tiny (probes × k·refineFactor), so dedup is free
    val shortlist = rankTopK(adc, k * refineFactor)
      .select(col("probe_id"), col("neighbor_id")).distinct()
    // exact re-rank of the shortlist only: slim id-joins fetch the float
    // vectors for probes × k·refineFactor rows, never the whole corpus
    val exact = shortlist
      .join(embeddings.select(col("vec_id").as("neighbor_id"),
        asDouble(col("embedding")).as("n_emb")), Seq("neighbor_id"))
      .join(broadcast(probe.select(col("probe_id"), col("p_emb"))), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosine(col("p_emb"), col("n_emb")).as("cos_sim"))
    rankTopK(exact, k)
  }

  // ----------------------------------------------------------- text analysis

  private val stopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"),
    "zh" -> Seq("的", "是", "了"))

  /** Rule-based language ID: stopword votes with a deterministic tie-break
    * (first language in fixed order wins ties). A real deployment swaps the
    * signal lists; the plumbing (score → argmax, fully codegen'd) stays.
    */
  def langIdScore(textCol: Column): Column = {
    val toks = tokens(textCol)
    val scores = stopwordsByLang.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight[Column](lit("und")) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** Quality scoring: length/punctuation/stopword signals → single score.
    * Integer-and-double arithmetic in a fixed order so any engine agrees.
    */
  def withQualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val meanTokLen = (length(col(textCol)) - nTok + 1).cast("double") / nTok.cast("double")
    val allStop = stopwordsByLang.flatMap(_._2)
    val stopRatio = size(array_intersect(array_distinct(toks), array(allStop.map(lit): _*)))
      .cast("double") / size(array_distinct(toks)).cast("double")
    val punct = length(regexp_replace(col(textCol), "[\\w\\s]", "")).cast("double")
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("mean_token_len", meanTokLen)
      .withColumn("stopword_ratio", stopRatio)
      .withColumn("punct_count", punct)
      .withColumn("quality_score",
        least(nTok.cast("double") / 40.0, lit(1.0)) * 0.5 +
          (lit(1.0) - stopRatio) * 0.3 +
          least(meanTokLen / 8.0, lit(1.0)) * 0.2)
  }

  /** Corpus mixture report — the "what do we train on" accounting every
    * multi-source pipeline runs before fixing sampling weights: per-group
    * document/token tallies, the EXACT integer token share (parts per
    * million, integer division so any engine agrees bit-for-bit), and a
    * temperature-smoothed target weight `sqrt(share)/Σ sqrt(share)` (the
    * T=2 member of the `share^(1/T)` family every mixture paper uses —
    * sqrt because it is correctly-rounded IEEE in every engine, unlike
    * pow). Feeds [[weightedResample]] quotas. One aggregate plus one
    * #groups-row window — the window runs on the already-aggregated tiny
    * frame, so the single-partition step is O(groups), never O(rows).
    */
  def mixtureReport(
      docs: DataFrame,
      groupCols: Seq[String] = Seq("lang"),
      textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    docs
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast("long")).as("n_tokens"))
      .withColumn("_total", sum(col("n_tokens")).over(w))
      // SQL `div`: INTEGRAL division (bit-exact in any engine; `/` on
      // longs is double division with boundary-rounding hazards)
      .withColumn("token_share_ppm", expr("(n_tokens * 1000000L) div _total"))
      .withColumn("target_weight",
        round(sqrt(col("n_tokens").cast("double")) /
          sum(sqrt(col("n_tokens").cast("double"))).over(w), 4))
      .drop("_total")
  }

  /** Text canonicalization — the normalize-before-dedup stage every corpus
    * pipeline runs first (different casings/punctuation of the same
    * sentence must dedup together): lowercase, map every character outside
    * `[a-z0-9 一-鿿]` (ASCII letters/digits, space, the CJK unified block —
    * explicit ranges so Java and RE2 regex classes agree byte-for-byte) to
    * a space, collapse space runs, trim. Adds `norm_text`; pure codegen'd
    * per-row string work, zero shuffle. The output is single-space
    * separated by construction, which downstream token arithmetic
    * (`tokens`, [[gopherRules]], chunk counts) relies on.
    */
  /** Deterministic MAIN-CONTENT extraction from HTML/markup — the
    * boilerplate-removal stage every web-crawl pipeline runs before
    * anything else (trafilatura/jusText's job, reduced to explicit
    * rules so any engine reproduces it byte-for-byte):
    *
    *  1. excise `<script>`/`<style>` elements and HTML comments (their
    *     contents are never prose);
    *  2. excise the classic boilerplate containers `<nav>`/`<header>`/
    *     `<footer>`/`<aside>` wholesale;
    *  3. split the remainder into blocks at block-level tags
    *     (`p|div|h1..h6|li|ul|ol|table|tr|td|br`);
    *  4. per block, strip all remaining tags, collapse whitespace, and
    *     keep the block only if its text is ≥ `minBlockChars` AND its
    *     link density is bounded: `3 * anchorTextLen <= textLen`
    *     (anchor text length = the character count that disappears when
    *     `<a>` ELEMENTS are excised before stripping — jusText's
    *     link-density idea with an integer-rational threshold, so no
    *     engine can disagree on a boundary block);
    *  5. join the surviving blocks' text.
    *
    * Every rule is a regex with explicit character classes and `(?is)`
    * inline flags — valid and identical in Java regex and RE2, so the
    * DuckDB oracle replays the extraction exactly (the q124/q71
    * discipline). Pure per-row string work: zero shuffle at any scale.
    * Adds `content` (extracted text) and `content_chars`.
    */
  def extractContent(
      docs: DataFrame,
      htmlCol: String = "html",
      minBlockChars: Int = 20): DataFrame = {
    def strip(c: Column): Column = regexp_replace(c, "<[^>]*>", " ")
    def collapse(c: Column): Column = trim(regexp_replace(c, "[ \t\r\n\f]+", " "))
    val cleaned = Seq(
      "(?is)<script[^>]*>.*?</script>",
      "(?is)<style[^>]*>.*?</style>",
      "(?s)<!--.*?-->",
      "(?is)<nav[^>]*>.*?</nav>",
      "(?is)<header[^>]*>.*?</header>",
      "(?is)<footer[^>]*>.*?</footer>",
      "(?is)<aside[^>]*>.*?</aside>"
    ).foldLeft(col(htmlCol))((c, re) => regexp_replace(c, re, " "))
    val blocks = split(cleaned, "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|br)[^>]*>")
    val scored = transform(blocks, b => {
      val tAll = collapse(strip(b))
      val tNoA = collapse(strip(regexp_replace(b, "(?is)<a[^>]*>.*?</a>", " ")))
      struct(
        tAll.as("t"),
        (length(tAll) >= minBlockChars &&
          (length(tAll) - length(tNoA)) * lit(3) <= length(tAll)).as("keep"))
    })
    docs
      .withColumn("content", collapse(array_join(
        transform(filter(scored, s => s.getField("keep")), s => s.getField("t")),
        " ")))
      .withColumn("content_chars", length(col("content")).cast("long"))
  }

  def normalizeText(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("norm_text",
      trim(regexp_replace(
        regexp_replace(lower(col(textCol)), "[^a-z0-9 一-鿿]", " "),
        " +", " ")))

  /** Gopher-style quality RULE BATTERY (Rae et al. 2021 §A1.1 shape): a
    * named boolean per rule plus the conjunction, so a corpus report can
    * attribute every rejection to the rule that fired — the form quality
    * filtering actually ships in (a single score like [[withQualityScore]]
    * ranks; a rule battery explains). Thresholds are integer rationals and
    * every rule evaluates with cross-multiplied INTEGER comparisons
    * (`meanLen >= num/den` ⇔ `wordChars*den >= n*num`), so no engine can
    * disagree on a boundary document. Pure codegen'd per-row arithmetic,
    * zero shuffle at any scale.
    *
    *  - `rule_word_count`: token count within [minWords, maxWords]
    *  - `rule_mean_word_len`: mean token length within the rational bounds
    *  - `rule_stopwords`: ≥ minStopTypes distinct known stopwords (the
    *    classic "is this prose" signal)
    *  - `rule_symbol_ratio`: non-word characters per token ≤ the rational
    *    bound (OCR noise / markup debris)
    */
  def gopherRules(
      docs: DataFrame,
      textCol: String = "text",
      minWords: Int = 25,
      maxWords: Int = 100000,
      meanLenMin: (Int, Int) = (3, 1),
      meanLenMax: (Int, Int) = (23, 5),
      minStopTypes: Int = 2,
      maxSymbolsPerWord: (Int, Int) = (1, 10)): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks).cast("long")
    // single-space-separated corpora: token chars = length - (n - 1)
    val wordChars = (length(col(textCol)) - n + 1).cast("long")
    val allStop = stopwordsByLang.flatMap(_._2)
    val stopTypes = size(array_intersect(array_distinct(toks), array(allStop.map(lit): _*)))
    val punct = length(regexp_replace(col(textCol), "[\\w\\s]", "")).cast("long")
    docs
      .withColumn("rule_word_count", n >= minWords && n <= maxWords)
      .withColumn("rule_mean_word_len",
        wordChars * meanLenMin._2 >= n * meanLenMin._1 &&
          wordChars * meanLenMax._2 <= n * meanLenMax._1)
      .withColumn("rule_stopwords", stopTypes >= minStopTypes)
      .withColumn("rule_symbol_ratio",
        punct * maxSymbolsPerWord._2 <= n * maxSymbolsPerWord._1)
      .withColumn("gopher_pass",
        col("rule_word_count") && col("rule_mean_word_len") &&
          col("rule_stopwords") && col("rule_symbol_ratio"))
  }

  /** Script/charset statistics — the writing-system member of the text
    * family: per-document ASCII / digit / space / CJK codepoint counts via
    * engine-identical character classes (explicit ranges only — Java and
    * RE2 agree on `[\x00-\x7F]` and the CJK block `[一-鿿]` = U+4E00–
    * U+9FFF, all BMP so code-unit and codepoint counts coincide). Pure
    * codegen'd regexp arithmetic, zero shuffle; feeds corpus routing
    * (script-specific tokenizers) and mostly-non-text filtering.
    */
  def withScriptStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    def kept(cls: String): Column =
      length(regexp_replace(col(textCol), s"[^$cls]", ""))
    docs
      .withColumn("n_chars_total", length(col(textCol)))
      .withColumn("ascii_chars", kept("\\x00-\\x7F"))
      .withColumn("digit_chars", kept("0-9"))
      .withColumn("space_chars", kept(" "))
      .withColumn("cjk_chars", kept("一-鿿"))
  }

  /** Lexical-diversity statistics per group: total / distinct / hapax
    * (frequency-1) token counts — type-token ratio and hapax share are
    * the classic vocabulary-richness signals for corpus QA (a scrape of
    * templated pages shows a collapsing TTR; OCR noise inflates hapax).
    * Two map-side-combined aggregates over the exploded token stream; the
    * only rows that shuffle are (group, token) partial counts.
    */
  def lexicalDiversity(
      docs: DataFrame,
      groupCols: Seq[String] = Seq("lang"),
      textCol: String = "text"): DataFrame = {
    val gcols = groupCols.map(col)
    val counts = docs
      .select(gcols :+ explode(tokens(col(textCol))).as("_t"): _*)
      .groupBy(gcols :+ col("_t"): _*)
      .agg(count(lit(1)).as("_n"))
    counts.groupBy(gcols: _*)
      .agg(
        sum(col("_n")).as("total_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum((col("_n") === 1L).cast("long")).as("hapax_tokens"))
  }

  /** REAL byte-pair-encoding tokenization ([[graft.functions.BpeTokenizer]]):
    * merges train once on a bounded hash-ordered sample (driver-side local
    * work, the way every production tokenizer trains on a sample), the
    * few-KB model broadcasts, and encoding is a per-row pure function —
    * embarrassingly parallel, no shuffle, corpus never moves. The scalar
    * UDF is deliberate here (same rationale as the CMS point query): BPE's
    * iterative lowest-rank merge has no built-in/codegen equivalent, and
    * the per-row cost is bounded by the run length. Adds `bpe_tokens`
    * (`array<string>`; `array_join(bpe_tokens, '') == text` ALWAYS — the
    * round-trip invariant q106 asserts) and `n_bpe_tokens`.
    */
  def bpeTokenize(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      numMerges: Int = 200,
      sampleN: Int = 2048): DataFrame = {
    // hash-ordered sample (fitSampleOrder): unbiased across shards yet
    // bit-reproducible — the same fix r10/r11 landed for the ANN fits
    val sample = docs.orderBy(fitSampleOrder(col(idCol)): _*).limit(sampleN)
      .select(col(textCol)).collect().map(r => Option(r.getString(0)).getOrElse(""))
    val model = graft.functions.BpeTokenizer.train(sample, numMerges)
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    val enc = udf((t: String) =>
      if (t == null) Vector.empty[String] else graft.functions.BpeTokenizer.encode(t, bc.value))
    docs.withColumn("bpe_tokens", enc(col(textCol)))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  def withTokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("ws_tokens", size(tokens(col(textCol))))
      .withColumn("bpe_tokens", regexp_count(col(textCol), lit("\\w+|[^\\w\\s]")))

  /** Canonical content fingerprint: md5 over the sorted distinct token set —
    * word-order-insensitive duplicate detection.
    */
  def fingerprint(textCol: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(textCol)))))

  /** Winnowing fingerprints (rolling-hash document fingerprinting): hash
    * every `k`-gram, slide a `w`-wide window over the hash sequence, keep
    * each window's minimum — the classic local fingerprinting scheme whose
    * selected hashes overlap heavily for documents sharing long substrings,
    * independent of where the shared run sits. Output column `fps` is the
    * distinct selected hash set per doc; compare docs with
    * [[graft.functions.SetFunctions.intersectCountSorted]].
    *
    * Fully `functions._`; the k-gram hash array is materialized in its own
    * projection before the window pass (see [[tokenHashes]] note).
    */
  def withWinnowingFingerprints(
      docs: DataFrame,
      textCol: String = "text",
      k: Int = 3,
      w: Int = 4,
      keepGrams: Boolean = false): DataFrame = {
    val grams = transform(
      sequence(lit(1), greatest(size(col("_th")) - (k - 1), lit(0))),
      i => xxhash64((0 until k).map(o => element_at(col("_th"), i + o)): _*))
    val windows = transform(
      sequence(lit(1), greatest(size(col("_gh")) - (w - 1), lit(0))),
      i => array_min(slice(col("_gh"), i, lit(w))))
    val out = docs
      .withColumn("_th", tokenHashes(col(textCol)))
      .withColumn("_gh", grams)
      .withColumn("fps", array_sort(array_distinct(windows)))
      .drop("_th")
    // keepGrams exposes the k-gram hash sequence (column `grams`) so callers
    // can assert the selection property fps ⊆ grams
    if (keepGrams) out.withColumnRenamed("_gh", "grams") else out.drop("_gh")
  }

  // ------------------------------------------- model-based quality (bigram LM)

  /** Bigram language-model scoring — the model-based member of the quality
    * family (CCNet-style perplexity filtering): train add-one-smoothed
    * bigram counts on the corpus itself, then score each document by its
    * mean bigram log-probability `avg ln((C(w1,w2)+1)/(C(w1·)+V))`.
    * Common collocations score high, token soup scores low; callers flag
    * the tail. Output adds `n_bigrams` and `lm_logprob` (null for
    * documents with fewer than two tokens).
    *
    * Scale shape: the model is two groupBy aggregates over the exploded
    * bigram stream (map-side partial sums) — only OBSERVED bigrams are
    * materialized, never vocab². Scoring first collapses the stream to
    * distinct (doc, bigram) rows with their in-doc counts, so the count
    * joins move one row per distinct bigram per doc, not one per token;
    * V rides a broadcast scalar row.
    */
  def withLmScore(
      docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // spreadIfNarrow (r19): the tokenize+bigram-explode pass runs in the
    // SCAN stage — a single-row-group corpus serializes it on one task
    val base = spreadIfNarrow(docs).select(col(idCol), tokens(col(textCol)).as("_toks"))
    // adjacent pairs; single-token docs produce (w1, null) and are dropped
    // by the null filter (sequence(1,0) would descend, hence the greatest)
    val pairs = base.select(col(idCol),
      explode(transform(
        sequence(lit(1), greatest(size(col("_toks")) - 1, lit(1))),
        i => struct(element_at(col("_toks"), i).as("w1"),
          try_element_at(col("_toks"), i + 1).as("w2")))).as("_bg"))
      .select(col(idCol), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
      .filter(col("w2").isNotNull)
    val perDoc = pairs.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("_k"))
    // corpus counts DERIVED from perDoc by window sums instead of separate
    // groupBy+join branches (r18 opt, guide §2.3/§2.4): C(w1,w2) = Σ_docs k
    // and C(w1·) = Σ_docs Σ_w2 k, so summing perDoc's _k over (w1, w2) and
    // (w1) windows yields bit-identical integers while the bigram explode
    // runs ONCE instead of three times (Catalyst recomputes each branch —
    // column pruning defeats exchange reuse) and the former c1/c2 join
    // tables — vocabulary-sized at 100 TB — never materialize or shuffle
    // as separate aggregation trees. Window order matters: partitionBy(w1)
    // first, then (w1, w2) — hash(w1) satisfies the (w1, w2) clustering,
    // so both windows ride ONE exchange.
    val vocab = base.select(explode(col("_toks")).as("_t"))
      .agg(countDistinct(col("_t")).cast("double").as("_v"))
    val scored = perDoc
      .withColumn("_c1", sum(col("_k")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
      .withColumn("_c2", sum(col("_k")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"), col("w2"))))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(
        sum(col("_k")).as("n_bigrams"),
        sum(col("_k").cast("double") *
          log((col("_c2") + lit(1L)).cast("double") /
            (col("_c1").cast("double") + col("_v")))).as("_lp"))
      .withColumn("lm_logprob", col("_lp") / col("n_bigrams").cast("double"))
      .drop("_lp")
    docs.join(scored, Seq(idCol), "left")
  }

  /** Top-k salient terms per document by TF-IDF — keyword extraction, the
    * per-document complement of [[bm25TopK]]'s query-side retrieval.
    * `tfidf = tf · ln(N / df)`; ties and float noise are neutralized by
    * ranking on `round(tfidf, 9)` with the term string as tie-break, so
    * the selected term set is engine-exact. Shuffle shape: (doc, term)
    * partial counts, a small (term, df) table joined back, and a per-doc
    * window — the doc's own terms only.
    */
  def topTfidfTerms(
      docs: DataFrame,
      k: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      /** Per-document-constant columns carried through the pipeline (e.g.
        * `lang`), so callers aggregating the keywords by them never
        * re-join the corpus — at 100 TB a tiny string riding the
        * (doc, term) exchange is strictly cheaper than a second corpus
        * scan + doc-keyed join.
        */
      carryCols: Seq[String] = Nil): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val carry = carryCols.map(col)
    // spreadIfNarrow (r19): same scan-stage tokenize rationale as withLmScore
    val base = spreadIfNarrow(docs)
      .select(col(idCol) +: carry :+ tokens(col(textCol)).as("_toks"): _*)
    val nDocs = base.agg(count(lit(1)).cast("double").as("_n"))
    val tf = base.select(col(idCol) +: carry :+ explode(col("_toks")).as("term"): _*)
      .groupBy(col(idCol) +: carry :+ col("term"): _*)
      .agg(count(lit(1)).cast("double").as("_tf"))
    // document frequency as a count over a term window instead of a
    // separate groupBy+join branch (r18 opt, guide §2.3/§2.4): tf rows are
    // distinct (doc, term), so count-over-term = docs containing the term,
    // bit-identical — while the tokenize+explode+aggregate pass runs ONCE
    // instead of twice (column pruning defeats exchange reuse between the
    // branches) and the former df table — the ENTIRE VOCABULARY, a
    // scale hazard to broadcast at 100 TB — never materializes.
    val w = Window.partitionBy(col(idCol))
      .orderBy(round(col("_tfidf"), 9).desc, col("term"))
    tf.withColumn("_df",
        count(lit(1)).over(Window.partitionBy(col("term"))).cast("double"))
      .crossJoin(broadcast(nDocs))
      .withColumn("_tfidf", col("_tf") * log(col("_n") / col("_df")))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col(idCol) +: carry :+ col("term_rank") :+ col("term") :+
        round(col("_tfidf"), 4).as("tfidf"): _*)
  }

  // ----------------------------------------------------------- text retrieval

  /** Okapi BM25 top-k retrieval: score every document against a small set
    * of keyword queries, return each query's `k` best documents.
    *
    * score(q, D) = Σ_{t ∈ q} idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    * with idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1) — the classic
    * Robertson/Spärck-Jones formulation.
    *
    * 100 TB shape: the query vocabulary is a plan literal, so the tf
    * explode ships ONLY tokens matching a query term into the (doc, term)
    * aggregate — the corpus text itself never shuffles. df/idf rides a
    * count-over-term window on that same slim aggregate (one corpus pass,
    * nothing vocabulary-sized), corpus-level stats (N, avgdl) are one
    * scalar row, and per-query ranking is the map-side-partial
    * [[graft.functions.TopK]] aggregate: k rows per task per query reach
    * the exchange, never the full score matrix.
    *
    * Scores are ranked on `round(score, 9)` (doc_id tie-break): documents
    * with identical term statistics score identically up to float
    * summation order, and the rounding collapses that noise so the
    * ranking is engine-independent. Output `score` is `round(_, 4)`.
    */
  def bm25TopK(
      docs: DataFrame,
      queries: Seq[(Long, String)],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    require(k > 0, s"k must be positive, got $k")
    val qTerms: Seq[(Long, Seq[String])] =
      queries.map { case (qid, q) => (qid, q.split(" ").toSeq.filter(_.nonEmpty).distinct) }
    val allTerms = qTerms.flatMap(_._2).distinct.sorted
    val termsLit = array(allTerms.map(lit): _*)

    // spreadIfNarrow (r19): same scan-stage tokenize rationale as withLmScore
    // (profiled: a 454 ms single-task job inside q120)
    val base = spreadIfNarrow(docs)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("double"))
    // corpus-level scalars: one row, broadcast into the scoring join
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
    // term frequencies for QUERY terms only — the filter runs before the
    // explode, so non-matching tokens never leave their scan partition
    val tf = base
      .select(col("doc_id"), col("dl"),
        explode(filter(col("_toks"), t => array_contains(termsLit, t))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

    val spark = docs.sparkSession
    import spark.implicits._
    val queryExpl = qTerms.flatMap { case (qid, ts) => ts.map((qid, _)) }
      .toDF("query_id", "term")

    // df(t) as a count over a term window instead of a groupBy+join branch
    // (r18 opt, guide §2.3/§2.4): tf rows are distinct (doc, term), so the
    // window count equals the joined df table bit-for-bit while the
    // query-term scan+explode pass runs ONCE instead of twice
    val scored = tf
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("term"))).cast("double"))
      .join(broadcast(queryExpl), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_contrib",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("_contrib")).as("_score"))

    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.TopK.topKByScore(k, round(col("_score"), 9), col("doc_id")).as("_top"))
      .select(col("query_id"), posexplode(col("_top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("doc_id"), round(col("col.score"), 4).as("score"))
  }

  /** Reciprocal-rank fusion — the standard hybrid-search combiner (one
    * lexical list, one semantic list, fused without score calibration).
    * Each input ranking is (query_id, item_id, rank); an item's fused
    * score is Σ_lists 1_000_000 / (k0 + rank) computed with INTEGER
    * division, so the fusion is bit-exact in any engine (the classic
    * 1/(k0+r) scaled to integers — order preserved, float ties
    * impossible). Output: per query the top `k` by (fused score desc,
    * item_id asc), with `fused_rank`.
    *
    * Scale shape: a union of slim (query, item, rank) triples, one
    * equi-shuffle groupBy, and a per-query window over ≤ lists·k rows —
    * the candidate lists are already top-k'd, so nothing here touches
    * corpus-sized data.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    require(k0 >= 0, s"k0 must be non-negative, got $k0")
    val unioned = rankings
      .map(_.select(col("query_id"), col("item_id"), col("rank")))
      .reduce(_ unionAll _)
    val scored = unioned
      .groupBy(col("query_id"), col("item_id"))
      .agg(sum(floor(lit(1000000) / (lit(k0) + col("rank"))).cast("long"))
        .as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("item_id"))
    scored.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= k)
  }

  // ------------------------------------------------- bloom semi-join prefilter

  /** Bloom-filter semi-join pre-filter: build a BloomFilter over the small
    * side's join keys (Spark's distributed sketch aggregate — partial
    * filters merge tree-style, rows never collect), broadcast the
    * few-MB filter, and drop big-side rows that cannot match BEFORE the
    * join's shuffle. False positives only (rate `fpp`) — the join that
    * follows re-verifies exactly, so results are identical to the plain
    * join; what changes is shuffle volume: at 100 TB a selective dim
    * filter turns the fact-side exchange from "everything" into
    * "matches + fpp". This is the explicit, composable form of what AQE's
    * runtime bloom join does for eligible plans — available to any
    * operator chain, not just eligible joins.
    *
    * The point query is a broadcast-sketch UDF like `heavyHitters`'
    * CMS lookup — no built-in expression exposes `mightContain`.
    */
  def bloomPreFilter(
      big: DataFrame,
      smallKeys: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01,
      smallKey: String = null): DataFrame = {
    import org.apache.spark.sql.types.{LongType, IntegerType, StringType}
    val bf = smallKeys.stat.bloomFilter(
      Option(smallKey).getOrElse(key), expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val keyType = big.schema(key).dataType
    // primitive-typed UDFs null-propagate, so NULL keys drop — exactly the
    // semi-join semantics (NULL never equi-matches)
    val might = keyType match {
      case LongType | IntegerType => udf((k: Long) =>
        bc.value.mightContainLong(k)).apply(col(key).cast("long"))
      case StringType => udf((k: String) =>
        k != null && bc.value.mightContainString(k)).apply(col(key))
      case t => throw new IllegalArgumentException(
        s"bloomPreFilter supports integral/string keys, got $t for '$key'")
    }
    big.filter(might)
  }

  // ------------------------------------------------------------ skew salting

  /** Salted equi-join for skewed keys. The big side gets a seeded random
    * salt in `[0, salts)`; the small side replicates each row across all
    * salts; the join key becomes `(key, salt)`, so a hot key's rows spread
    * over `salts` reducers instead of melting one. AQE's skew-join split
    * handles moderate skew automatically — salting is the explicit tool for
    * the pathological case (one key ≫ everything, or non-AQE engines).
    * Results are exactly those of the plain equi-join; the small side grows
    * `salts`-fold, so keep `salts` ≪ small-side row count budget.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val bigS = big.withColumn("_salt", (rand(42) * salts).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  // ------------------------------------------------------------ as-of join

  /** As-of join (latest right row with `right.time <= left.time` per key)
    * via the union trick: tag both sides, union, one window pass with
    * `last(ignoreNulls)` ordered by (time, tag) — right rows sort before
    * left rows at equal times, so same-instant matches are included.
    *
    * One shuffle total (by key), no per-row subquery, no range explosion —
    * the scalable formulation of the classic point-in-time lookup.
    * `right` must carry exactly (keyCol, timeCol, valueCol); duplicate
    * (key, time) pairs on the right should be pre-aggregated by the caller
    * for deterministic results.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.select(
      col(keyCol), col(timeCol), lit(1).as("_tag"),
      lit(null).cast(right.schema(valueCol).dataType).as(valueCol))
    val r = right.select(col(keyCol), col(timeCol), lit(0).as("_tag"), col(valueCol))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("asof_" + valueCol, last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", valueCol)
  }

  // ------------------------------------------------- sampling & sketches

  /** Stratified Bernoulli sample — the training-data-mixing primitive:
    * draw each row independently with its stratum's fraction (seeded, so
    * re-runs select the same rows). Strata absent from `fractions` are
    * dropped (fraction 0). Per-row draw, no shuffle, no skew — a stratum's
    * size is binomial(n, f), which the spec pins with a 6σ envelope.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      fractions: Map[String, Double],
      seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic fixed-size per-stratum sample: exactly `min(k, |group|)`
    * rows per group, chosen by a content-independent pseudo-random order —
    * `md5` of the id — so the selection is bit-reproducible across runs
    * AND engines (no RNG, no partition-order dependence); the
    * fixed-count complement of [[stratifiedSample]]'s per-row Bernoulli.
    * One shuffle on the group key; ranking is per-group only.
    */
  def sampleKPerGroup(
      df: DataFrame,
      k: Int,
      groupCols: Seq[String],
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Count–Min sketch of `keyCol`, aggregated distributed (partial
    * sketches merge associatively map-side; only the ~`O(1/eps × ln(1/δ))`
    * sketch crosses to the driver), returned as a point-query handle.
    * Estimates never underestimate; they overestimate by at most
    * `eps × totalCount` with probability `confidence`.
    */
  def frequencySketch(
      df: DataFrame,
      keyCol: Column,
      eps: Double = 1e-3,
      confidence: Double = 0.99,
      seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = df
      .agg(count_min_sketch(keyCol.cast("string"), lit(eps), lit(confidence), lit(seed)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  /** CMS heavy hitters: `(key, estimate)` for every distinct key whose
    * estimated share of the total is ≥ `minShare`. The sketch is broadcast
    * and point-queried executor-side over the distinct-key set (far smaller
    * than the rows — the only shuffle is the key distinct). Because CMS
    * never underestimates, no truly-heavy key can be missed; false
    * positives are bounded by the sketch's `eps` overestimate.
    */
  def heavyHitters(
      df: DataFrame,
      keyCol: Column,
      minShare: Double,
      eps: Double = 1e-3,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    val sk = frequencySketch(df, keyCol, eps, confidence, seed)
    val threshold = math.ceil(minShare * sk.totalCount()).toLong
    val bc = spark.sparkContext.broadcast(sk)
    val estimate = udf((k: String) => bc.value.estimateCount(k))
    // null keys are skipped by count_min_sketch when building, so they can
    // never be heavy — drop them before the point query (estimateCount(null)
    // throws)
    df.select(keyCol.cast("string").as("key")).filter(col("key").isNotNull).distinct()
      .withColumn("estimate", estimate(col("key")))
      .filter(col("estimate") >= threshold)
  }

  // ------------------------------------- dedup cluster resolution (CC)

  /** Connected components over a near-dup pair list — the step that turns
    * LSH / overlap PAIRS into one keeper per duplicate *cluster*. Without
    * it, transitive duplicates (A~B, B~C) survive pairwise dedup.
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC '14) — O(log n)
    * rounds of pure equi-shuffles on node ids. Plain label propagation
    * needs O(diameter) rounds, and dup chains at corpus scale can be very
    * long; star-contraction is the 100 TB shape. Each round the edge list
    * is `localCheckpoint`ed to truncate lineage (swap for a reliable
    * `checkpoint` dir on a real cluster) and convergence is detected by an
    * order-invariant edge-set checksum — one cheap action per round.
    *
    * Input: `id_a`, `id_b` (any orientation, dups fine). Output: one row
    * per distinct id with (`id`, `cluster_id`), `cluster_id` = the
    * smallest id in the component — "keep the smallest id" then falls out
    * as `id === cluster_id`.
    */
  def dedupClusters(
      pairs: DataFrame, maxIter: Int = 25,
      localFinishEdges: Long = 1L << 20): DataFrame = {
    // canonical orientation u > v
    val e0 = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

    // large-star: every node attaches its LARGER neighbors to the minimum
    // of its neighborhood (incl. itself) — output stays u > v oriented.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("_mn"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("u"), col("_mn")).as("v"))
        .distinct()
    }

    // small-star: every node attaches its SMALLER-or-equal neighbors (and
    // itself) to the minimum of that neighborhood. Edges arrive u > v, so
    // N(u) = all its v's; m = min(N(u)); emit (x, m) for x ∈ N(u) ∪ {u}.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("_mn"))
      e.join(mins, "u")
        .select(col("v").as("u"), col("_mn").as("v"))
        .union(mins.select(col("u"), col("_mn").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // order-invariant distinct-edge-set signature (xor never overflows,
    // unlike sum under ANSI arithmetic)
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    // LOCAL FINISH (the "complete small work locally" move every
    // production CC implementation makes, same bounded-collect contract
    // as the ANN quantizer fits): each star round costs a fixed
    // multi-stage scheduling floor (~6 shuffles + 2 actions) REGARDLESS
    // of edge count, and O(log n) rounds of that floor dominate small
    // graphs outright. When the live edge set fits under
    // `localFinishEdges` (16 MB of longs at the default 1M), a
    // driver-side union-find replaces the whole loop with one bounded
    // collect. The check re-runs each round because canonical-distinct
    // contraction can collapse parallel edges below the threshold after
    // a round or two; graphs that stay big converge fully distributed,
    // as before. Applies only to 64-bit integer node ids — anything else
    // keeps the pure-DataFrame loop.
    val localizable = e0.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    def localFinish(e: DataFrame): DataFrame = {
      val sess = e.sparkSession
      // attach larger roots under smaller ones → each final root IS the
      // component min, matching the distributed fixpoint's labels exactly
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x
        while (c != r && parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      // bounded by localFinishEdges rows of two longs — one job
      e.collect().foreach { row =>
        val u = row.getLong(0); val v = row.getLong(1)
        parent.putIfAbsent(u, u); parent.putIfAbsent(v, v)
        val ru = find(u); val rv = find(v)
        if (ru < rv) parent.put(rv, ru)
        else if (rv < ru) parent.put(ru, rv)
      }
      val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](parent.size())
      parent.keySet().forEach(id => out += org.apache.spark.sql.Row(id, find(id)))
      sess.createDataFrame(
        sess.sparkContext.parallelize(out.toSeq,
          math.max(1, math.min(sess.sparkContext.defaultParallelism, out.size / 4096 + 1))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("cluster_id",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }

    var edges = e0.localCheckpoint(true)
    var s = sig(edges)
    var converged = s._1 == 0L
    var it = 0
    while (!converged && it < maxIter) {
      if (localizable && s._1 <= localFinishEdges) return localFinish(edges)
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val ns = sig(next)
      converged = ns == s
      edges = next
      s = ns
      it += 1
    }
    require(converged, s"dedupClusters did not converge in $maxIter rounds")

    // fixpoint = min-rooted stars: edges are (member, componentMin) for
    // every non-root member; roots label themselves.
    val members = edges.select(col("u").as("id"), col("v").as("cluster_id"))
    val roots = edges.select(col("v").as("id")).distinct()
      .join(members.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"))
    members.union(roots)
  }

  // ------------------------------------ within-document repetition filter

  /** Gopher-style repetition stats: per document, the total and distinct
    * n-gram counts (docs shorter than `n` tokens count 0/0). Downstream
    * quality filters threshold the duplicate fraction
    * `(total - distinct) / total`. Zero shuffle, embarrassingly parallel.
    *
    * Prep follows the [[ngramHashes]] recipe: token hashes materialize in
    * their OWN projection, grams are integer hash-combines of `n`
    * adjacent token hashes. The earlier string form inlined
    * `split(text)` into the gram lambda — re-evaluated per `slice`
    * access, O(tokens²) per doc (the trap documented on [[ngramHashes]])
    * — and evaluated the gram array once per consumer column on top.
    */
  def withRepetitionStats(
      docs: DataFrame, n: Int = 3, textCol: String = "text"): DataFrame = {
    val grams = when(size(col("_th")) >= n,
      transform(sequence(lit(1), size(col("_th")) - (n - 1)),
        i => xxhash64((0 until n).map(o => element_at(col("_th"), i + o)): _*)))
      .otherwise(array().cast("array<bigint>"))
    docs
      .withColumn("_th", tokenHashes(col(textCol)))
      .withColumn("_grams", grams)
      .withColumn("total_ngrams", size(col("_grams")).cast("long"))
      .withColumn("distinct_ngrams", size(array_distinct(col("_grams"))).cast("long"))
      .drop("_th", "_grams")
  }

  // ------------------------------------------------------- PII redaction

  /** Redact emails, IPv4/IPv6 addresses and phone numbers to typed
    * placeholder tokens — the standard pretraining scrub pass. The patterns
    * avoid lookarounds so the SAME regex runs identically under Java
    * (Spark) and RE2 (DuckDB/Go scrubbers); email runs first so its digits
    * can't be nibbled by the IP passes, and IPv4 runs before phone so
    * dotted octets aren't phone-nibbled. Pure `regexp_replace` —
    * codegen'd, no UDF.
    *
    * Coverage (deliberate, to bound false positives on prose):
    *  - phone: NANP-style 3-3-4 with space/dot/dash separators and an
    *    optional `+CC` prefix and/or `(NNN)` area code, plus the compact
    *    international `+CC NNN-NNNN` shape. Bare unseparated 10-digit
    *    runs are NOT matched (they false-positive IDs/timestamps), and
    *    non-NANP groupings (e.g. `+44 20 7946 0958`) are out of scope.
    *  - IPv6: full 8-group form and `::`-compressed forms with hex on
    *    both sides; ≥5 groups required for the uncompressed form so
    *    `hh:mm:ss` times survive.
    */
  def redactPii(c: Column): Column = {
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(c, PiiPatterns.email, "<EMAIL>"),
          PiiPatterns.ipv4, "<IP>"),
        PiiPatterns.ipv6, "<IP6>"),
      PiiPatterns.phone, "<PHONE>")
  }

  /** The redaction regexes, shared verbatim with the DuckDB oracle (q71
    * splices these strings into SQL literals — single source of truth, no
    * drift). Lookaround-free; Java and RE2 semantics agree.
    */
  object PiiPatterns {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    // full (>=5 groups, so hh:mm:ss never matches) | ::-compressed
    val ipv6 = "\\b(([0-9A-Fa-f]{1,4}:){4,7}[0-9A-Fa-f]{1,4}|" +
      "([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,5})\\b"
    // (+CC)? ((NNN) | NNN[sep]) NNN[sep]NNNN  |  +CC NNN[sep]?NNNN
    val phone = "((\\+\\d{1,3}[ .-])?(\\(\\d{3}\\)[ .-]?|\\d{3}[ .-])" +
      "\\d{3}[ .-]\\d{4}|\\+\\d{1,3}[ .-]\\d{3}[ .-]?\\d{4})\\b"
  }

  // ----------------------------------------------- chunking & resampling

  /** Sliding-window document chunking for embedding / retrieval pipelines:
    * token windows of `chunkTokens` advancing by `chunkTokens -
    * overlapTokens`; the final window may be short, and every document
    * emits at least one chunk. Output rows: (`idCol`, `chunk_id`,
    * `start_tok`, `chunk_tokens`, `chunk_text`). Pure per-row integer
    * window arithmetic + an explode — zero shuffle, embarrassingly
    * parallel at any corpus size.
    */
  def chunkDocuments(
      docs: DataFrame,
      chunkTokens: Int = 96,
      overlapTokens: Int = 32,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = tokens(col(textCol))
    docs
      .withColumn("_toks", toks)
      .withColumn("_n", size(col("_toks")).cast("long"))
      .filter(col("_n") > 0)
      // ceil((n - overlap) / stride), clamped to >= 1 — engines' int-div
      // rounding only differs for negative numerators, which clamp anyway
      .withColumn("_n_chunks",
        greatest(expr(s"(_n - $overlapTokens + ${stride - 1}) div $stride"), lit(1L)))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("_n_chunks") - 1)))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("chunk_tokens", least(lit(chunkTokens.toLong), col("_n") - col("start_tok")))
      .withColumn("chunk_text",
        array_join(slice(col("_toks"), (col("start_tok") + 1).cast("int"),
          col("chunk_tokens").cast("int")), " "))
      .drop("_toks", "_n", "_n_chunks")
  }

  /** Deterministic weighted resampling for domain mixing (the "temperature
    * sampling" step that rebalances sources before training): every row in
    * stratum `k` appears `floor(w_k)` times, plus once more on a
    * deterministic `id % 1000 < round(frac(w_k)*1000)` slice. No RNG — the
    * mix is bit-reproducible across runs and engines — and no shuffle
    * (just a per-row explode); strata absent from `weights` (or weighted
    * 0) are dropped. Id-slice selection is unbiased when ids are dense or
    * uniformly distributed mod 1000, which holds for sequence-assigned ids.
    */
  def resampleByWeight(
      df: DataFrame,
      weights: Map[String, Double],
      stratumCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val wCol = weights.foldLeft(lit(0.0)) { case (acc, (k, w)) =>
      when(col(stratumCol) === k, lit(w)).otherwise(acc)
    }
    val copies = floor(wCol).cast("long") +
      when(pmod(col(idCol), lit(1000L)) <
        round((wCol - floor(wCol)) * 1000).cast("long"), 1L).otherwise(0L)
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .withColumn("copy_nr", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")
  }

  // ------------------------------------------------------ decontamination

  /** Benchmark decontamination: drop every corpus document sharing ANY
    * n-token substring with the benchmark set (the standard eval-leakage
    * guard). The benchmark gram set is tiny relative to the corpus —
    * explicitly broadcast — so the only shuffle-free scan over 100 TB of
    * corpus grams is a broadcast-hash semi-join; contaminated ids then
    * anti-join back. Docs shorter than `n` tokens can never match and are
    * kept.
    */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val benchGrams = explodedGramHashes(benchmark, n, textCol, idCol)
      .select(col("gram")).distinct()
    val dirty = explodedGramHashes(corpus, n, textCol, idCol)
      .join(broadcast(benchGrams), "gram")
      .select(col("_id").as(idCol))
      .distinct()
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  // ------------------------------------------- deterministic split & profile

  /** 4-hex-digit md5-prefix threshold for a fraction: `frac` of the 65536
    * equally-likely prefixes fall strictly below it. Shared with the q90
    * oracle so both engines compare against the identical literal.
    */
  def hexThreshold(frac: Double): String = {
    require(frac >= 0 && frac <= 1, s"fraction must be in [0,1], got $frac")
    f"${math.round(frac * 65536).toInt.min(65535)}%04x"
  }

  /** Deterministic train/val/test assignment — the split every training
    * pipeline needs to be REPRODUCIBLE and incremental-safe: membership
    * depends only on the row's key (md5 prefix vs fixed hex thresholds),
    * never on partition layout, row order, or corpus size, so re-running
    * over a grown corpus never migrates an old row between splits.
    * Pure per-row string ops — codegen'd, zero shuffle at any scale.
    * Granularity is 1/65536; lowercase-hex md5 matches every engine.
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      valFrac: Double = 0.1,
      testFrac: Double = 0.1,
      splitCol: String = "split"): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1,
      s"fractions must be non-negative and sum <= 1, got val=$valFrac test=$testFrac")
    val tVal = hexThreshold(valFrac)
    val tValTest = hexThreshold(valFrac + testFrac)
    val prefix = substring(md5(col(keyCol).cast("string")), 1, 4)
    df.withColumn(splitCol,
      when(prefix < tVal, "val")
        .when(prefix < tValTest, "test")
        .otherwise("train"))
  }

  /** Deterministic global training shuffle WITHOUT a global sort — the
    * shard-and-shuffle step that turns a curated corpus into training
    * input. Each row gets a `shard` (which output file group it belongs
    * to) and a `shuffle_key` (its pseudo-random order inside the shard),
    * both pure integer arithmetic on the row's key: a multiplicative hash
    * `h = ((key mod 2³¹)·2654435761 + seed) mod 2³²` (Knuth), sharded by
    * `h mod shards`, ordered by `h·48271 mod (2³¹−1)` (MINSTD step). No
    * engine-specific hash, no RNG state: assignment and order depend only
    * on (key, seed), so a re-run — or a DIFFERENT engine — reproduces the
    * identical shuffle, and growing the corpus never reorders surviving
    * rows relative to each other within a shard.
    *
    * Scale: the plan is one `repartition(shard)` + `sortWithinPartitions`
    * — each shard sorts locally (100 TB never pays a total order), and
    * writing with `partitionBy(shard)` streams each sorted shard straight
    * to its files.
    */
  def trainingShuffle(
      df: DataFrame,
      keyCol: String,
      shards: Int,
      seed: Long = 0L): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val h = pmod(
      (pmod(col(keyCol).cast("long"), lit(2147483648L)) * 2654435761L + seed),
      lit(4294967296L))
    df.withColumn("shard", pmod(h, lit(shards.toLong)).cast("int"))
      .withColumn("shuffle_key", pmod(h * 48271L, lit(2147483647L)))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col(keyCol))
  }

  /** One-pass column profiling — the QA report run before any corpus ships:
    * per column, non-null/null counts, exact distinct count, and min/max
    * rendered as strings (one uniform output schema for any column type).
    * A single aggregate over one scan (the distinct counts expand via
    * Spark's grouping-sets rewrite, still one pass over the data); the
    * per-column rows come from exploding the 1-row aggregate, so nothing
    * is driver-side. Exact distincts shuffle by value — that is the cost
    * of an exact profile; pair with approxDistinct (q28) when an estimate
    * is enough.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val stats = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        count(col(c)).as("non_nulls"),
        (count(lit(1)) - count(col(c))).as("nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
    }
    df.agg(stats.head.as("_s0"), stats.tail.zipWithIndex.map {
        case (s, i) => s.as(s"_s${i + 1}")
      }: _*)
      .select(explode(array(cols.indices.map(i => col(s"_s$i")): _*)).as("_p"))
      .select(col("_p.*"))
  }
}
