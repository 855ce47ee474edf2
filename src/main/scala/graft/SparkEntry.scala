package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one entry per implemented operator (SURVEY.md §2);
  * each SQL-expressible one has a DuckDB oracle in `oracleSql` over the
  * same parquet tables in `sfDir`. Outputs avoid raw doubles (driver
  * hash-compares values) — aggregates are integers or explicitly rounded.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full pipeline core over synthesized sequences:
    * parse → rules filter → route → per-sink counts. */
  def entry(spark: SparkSession): DataFrame = {
    val seqs = DataGen.sequences(spark, 10000L)
    Pipeline.routedRecords(seqs, DataGen.routingRules)
      .groupBy("content_type").agg(count(lit(1)).as("routed_rows"))
      .orderBy("content_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- A: aggregations (SURVEY §2.4) -------------------------------
    "q_agg_group" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("cnt"),
          count_distinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_route_count" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    "q_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)),

    // ---- P/F: filters + scalar functions (SURVEY §2.2, §2.7) ---------
    "q_filter_absent_key_passes" -> ((s, d) => {
      // P1 semantics: rows where key is NULL pass; non-null must equal value.
      val ev = t(s, d, "events")
      val policy = get_json_object(col("props"), "$.plan")
      ev.withColumn("plan", policy)
        .filter(col("plan").isNull || col("plan") === "premium")
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),

    "q_proj_string_funcs" -> ((s, d) =>
      t(s, d, "documents")
        .select(
          col("doc_id"),
          translate(col("lang"), ".", "_").as("log_type"),
          lower(col("source")).as("src_lower"),
          length(col("text")).cast("long").as("text_len"), // DuckDB length() is BIGINT
          substring(col("text"), 1, 8).as("prefix"))
        .orderBy("doc_id")),

    "q_date_funcs" -> ((s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          (unix_timestamp(col("ts")) % 86400).as("sec_of_day"))
        .orderBy("event_id")),

    "q_window_split_24h" -> ((s, d) =>
      // ST3: assign events to 24h tumbling windows, count per window
      t(s, d, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("window_start"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("window_start")),

    // ---- J: joins (SURVEY §2.3) ---------------------------------------
    "q_join_broadcast_enrich" -> ((s, d) => {
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("cnt"))
        .orderBy("r_name")
    }),

    "q_join_anti_dedup" -> ((s, d) => {
      // J1: customers with no orders (left anti ≡ the known-content dedup)
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "q_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 100000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    }),

    "q_join_outer" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
        .orderBy("c_mktsegment")
    }),

    // ---- O: sorts / limits / set ops (SURVEY §2.6) ---------------------
    "q_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey")),

    "q_union_schema" -> ((s, d) => {
      // O4/P6: union-schema with missing-column padding ("")
      val a = t(s, d, "customer").select(col("c_name").as("name"), col("c_mktsegment").as("seg"))
      val b = t(s, d, "supplier").select(col("s_name").as("name"))
        .withColumn("seg", lit(null: String))
      a.unionByName(b).na.fill("").groupBy("seg").agg(count(lit(1)).as("cnt")).orderBy("seg")
    }),

    "q_duplicate_explode" -> ((s, d) =>
      // O6: row multiplier via explode(array_repeat(...))
      t(s, d, "region")
        .withColumn("i", explode(array_repeat(lit(1), 3)))
        .groupBy("r_name").agg(count(lit(1)).as("cnt"))
        .orderBy("r_name")),

    "q_distinct" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")),

    // ---- W: window functions (SURVEY §2.5) -----------------------------
    "q_window_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey")
    }),

    // ---- checksum (SURVEY §2.4 A9) — arithmetic so DuckDB agrees --------
    "q_checksum_orderless" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(expr("bit_xor(event_id * 2654435761 + user_id)").as("checksum"))
        .orderBy("event_type")),

    // ---- set ops (SURVEY §2.6 O5) --------------------------------------
    "q_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    "q_except" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey").as("nk"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // ---- JSON + crypto scalar functions (SURVEY §2.7 F1-F3, F7) --------
    "q_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.plan").as("plan"),
          get_json_object(col("props"), "$.device").as("device"))
        .orderBy("event_id")),

    "q_json_corrupt" -> ((s, d) => {
      // F1/ST6: PERMISSIVE JSON parse with poison-row quarantine. Every
      // 7th event's payload is deterministically corrupted; from_json
      // returns NULL for those (never throws), splitting the batch into
      // parsed/quarantined — the reference's warn-and-skip as a column op.
      val ev = t(s, d, "events")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))
      val payload = when(pmod(col("event_id"), lit(7)) === 0,
          concat(lit("!corrupt!"), substring(col("props"), 1, 5)))
        .otherwise(col("props"))
      ev.select(col("event_type"), payload.as("payload"))
        .withColumn("ok", JsonIngest.isParsable(col("payload"), schema))
        .withColumn("rec", from_json(col("payload"), schema))
        .select(col("event_type"),
          when(col("ok"), "parsed").otherwise("quarantined").as("status"),
          when(col("ok"), coalesce(col("rec.k"), lit(0))).otherwise(lit(0))
            .cast("long").as("k"))
        .groupBy("event_type", "status")
        .agg(count(lit(1)).as("cnt"), sum("k").as("sum_k"))
        .orderBy("event_type", "status")
    }),

    "q_hash_md5" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), md5(col("text")).as("text_md5"))
        .orderBy("doc_id")),

    // ==== training-data ops ==============================================

    "q_dedup_exact" -> ((s, d) => {
      // exact dedup over a corpus with injected duplicates: keep first id
      val docs = t(s, d, "documents").select("doc_id", "text", "lang")
      val dups = docs.select((col("doc_id") + 10000).as("doc_id"), col("text"), col("lang"))
      DedupOps.exactDedup(docs.unionByName(dups), Seq("text"), "doc_id")
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    "q_text_stats" -> ((s, d) =>
      TextOps.qualityScore(t(s, d, "documents"))
        .select("doc_id", "n_words", "mean_word_len_x1000",
          "distinct_ratio_x1000", "n_punct", "stopword_hits")
        .orderBy("doc_id")),

    "q_text_redact" -> ((s, d) =>
      // PII scrubbing over planted addresses (the corpus itself carries
      // none): both engines build the identical text, then redact with the
      // same Java/RE2-portable patterns — byte-compared output
      TextOps.redactPii(
          t(s, d, "documents").select(col("doc_id"),
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com at 10.0."),
              pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")).as("text")))
        .select("doc_id", "n_emails", "n_ips", "text_redacted")
        .orderBy("doc_id")),

    "q_text_repetition" -> ((s, d) =>
      // Gopher-style duplicate-n-gram fractions (boilerplate/spam filter)
      TextOps.repetitionStats(t(s, d, "documents"))
        .select("doc_id", "dup_2gram_frac_x1000", "dup_3gram_frac_x1000")
        .orderBy("doc_id")),

    "q_text_repetition_gopher" -> ((s, d) => {
      // the rest of the Gopher A1.1 family: duplicate-line fractions +
      // top-n-gram char fractions. Corpus documents are single-line, so
      // synthesize multi-line text with one planted duplicate line per doc
      // (same oracle-side construction) to keep the line signals live.
      val ml = t(s, d, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"), col("text"),
          concat(lit("unique "), col("doc_id"))).as("text"))
      TextOps.gopherRepetition(ml)
        .select("doc_id", "dup_line_frac_x1000", "dup_line_char_frac_x1000",
          "top_2gram_char_frac_x1000", "top_3gram_char_frac_x1000",
          "top_4gram_char_frac_x1000")
        .orderBy("doc_id")
    }),

    "q_text_quality_gopher" -> ((s, d) => {
      // Gopher A1.1 quality signals + the combined keep flag, over text
      // synthesized with bullets / conditional ellipses / '#' runs so every
      // signal is live (same construction oracle-side)
      val ml = t(s, d, "documents").select(col("doc_id"),
        concat_ws("\n",
          col("text"),
          concat(lit("- bullet item "), pmod(col("doc_id"), lit(5)).cast("string")),
          concat(lit("to be continued"),
            when(pmod(col("doc_id"), lit(3)) === 0, lit("...")).otherwise(lit(""))),
          lit("# 42 ###")).as("text"))
      TextOps.gopherKeep(ml, minWords = 5)
        .select(col("doc_id"), col("symbol_word_ratio_x1000"),
          col("bullet_line_frac_x1000"), col("ellipsis_line_frac_x1000"),
          col("alpha_word_frac_x1000"), col("gopher_keep").cast("long").as("gopher_keep"))
        .orderBy("doc_id")
    }),

    "q_text_langid" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "q_text_fingerprint" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")),

    "q_minhash_signature" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          DedupOps.minhashSignature(col("text"), 2, 2).getItem(0).as("m0"),
          DedupOps.minhashSignature(col("text"), 2, 2).getItem(1).as("m1"))
        .orderBy("doc_id")),

    "q_dedup_minhash_lsh" -> ((s, d) =>
      DedupOps.minhashNearDups(t(s, d, "documents"), "doc_id", "text",
          n = 2, k = 8, bands = 4, minJaccardPct = 60)
        .select(col("id_a"), col("id_b"),
          col("inter_size").cast("long").as("inter_size"),
          col("union_size").cast("long").as("union_size"))
        .orderBy("id_a", "id_b")),

    "q_dedup_ngram_jaccard" -> ((s, d) =>
      DedupOps.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          "lang", n = 2, minJaccardPct = 55)
        .select(col("blk"), col("id_a"), col("id_b"),
          col("inter_size").cast("long").as("inter_size"),
          col("union_size").cast("long").as("union_size"))
        .orderBy("blk", "id_a", "id_b")),

    "q_simhash_portable" -> ((s, d) =>
      // 16-bit portable-arithmetic simhash — DuckDB-verifiable (the 64-bit
      // production variant uses xxhash64, which DuckDB lacks)
      t(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.GraftFunctions.simhash_poly(col("text"), 16).as("simhash16"))
        .orderBy("doc_id")),

    "q_dedup_simhash" -> ((s, d) => {
      // xxhash64-based — no DuckDB equivalent; rows-only check
      val docs = t(s, d, "documents").select("doc_id", "text")
      val dups = docs.select((col("doc_id") + 10000).as("doc_id"), col("text"))
      DedupOps.simhashNearDups(docs.unionByName(dups), "doc_id", "text", maxHamming = 0)
        .orderBy("id_a", "id_b")
    }),

    "q_dedup_clusters" -> ((s, d) =>
      // near-dup clustering: minhash pairs -> connected components; every
      // doc labeled with its cluster's canonical (minimum) id
      DedupOps.nearDupClusters(t(s, d, "documents"), "doc_id", "text",
          n = 2, k = 8, bands = 4, minJaccardPct = 60)
        .select(col("id"), col("cluster"),
          col("is_canonical").cast("int").as("is_canonical"))
        .orderBy("id")),

    "q_dedup_spans" -> ((s, d) =>
      // C4-style span dedup: repeated 8-word chunks keep only their
      // globally-first occurrence; docs reassembled from survivors
      DedupOps.spanDedup(t(s, d, "documents"), "doc_id", "text", 8)
        .select(col("id"), col("n_kept"), col("text_deduped"))
        .orderBy("id")),

    "q_dedup_spans_cdc" -> ((s, d) =>
      // alignment-free span dedup: content-defined chunk boundaries
      // (portable word hash % 8 == 0), global first-occurrence survives
      DedupOps.spanDedupCdc(t(s, d, "documents"), "doc_id", "text", 8)
        .select(col("id"), col("n_kept"), col("text_deduped"))
        .orderBy("id")),

    "q_dedup_survivors" -> ((s, d) =>
      // the corpus a training pipeline keeps: canonical doc per near-dup
      // cluster, full original rows
      DedupOps.dedupNearDups(t(s, d, "documents").select("doc_id", "text", "lang"),
          "doc_id", "text", n = 2, k = 8, bands = 4, minJaccardPct = 60)
        .select("doc_id", "lang").orderBy("doc_id")),

    "q_sample_stratified" -> ((s, d) =>
      // deterministic data mixing: per-language keep rates, reproducible
      // across engines from the portable hash (no RNG state)
      TrainingOps.stratifiedSample(t(s, d, "documents"), "doc_id", "lang",
          Map("en" -> 500, "de" -> 250, "zh" -> 100), defaultPerMille = 1000)
        .select("doc_id", "lang").orderBy("doc_id")),

    "q_bpe_tokenize" -> ((s, d) => {
      // real BPE: merges learned from the corpus word-frequency table,
      // encode scan-side. No oracle — the iterative merge training is not
      // SQL-expressible; BpeOpsSpec pins the classic merge example, the
      // kernel ≡ reference equality, and lossless round-trip instead.
      val docs = t(s, d, "documents")
      val merges = BpeOps.bpeTrain(docs, "text", nMerges = 60)
      BpeOps.tokenize(docs, "text", merges)
        .select("doc_id", "n_bpe_tokens").orderBy("doc_id")
    }),

    "q_sessionize" -> ((s, d) =>
      // gap sessionization over the event stream: 30-min inactivity opens
      // a new session; microsecond-exact, deterministic tie-break
      EventOps.sessionize(t(s, d, "events"), "user_id", "ts",
          gapSeconds = 1800, tieCol = "event_id")
        .select("event_id", "user_id", "session_seq", "session_pos")
        .orderBy("event_id")),

    "q_funnel" -> ((s, d) =>
      // ordered conversion funnel view → click → purchase: earliest
      // strictly-increasing chain per user, partial prefixes kept
      EventOps.funnel(t(s, d, "events"), "user_id", "ts",
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"))
        .select("user_id", "t_1", "t_2", "t_3", "steps_completed")
        .orderBy("user_id")),

    "q_join_asof" -> ((s, d) => {
      // backward as-of join: each event picks the rate in effect at its
      // timestamp (rates = a deterministic snapshot subset of the stream)
      val ev = t(s, d, "events")
      val rates = ev.filter(pmod(col("event_id"), lit(20)) === 0)
        .groupBy("event_type", "ts").agg(max("value").as("rate"))
        .withColumnRenamed("ts", "rts")
      EventOps.asofJoinBackward(
          ev.select("event_id", "event_type", "ts"), rates,
          "event_type", "ts", "rts", "rate")
        .select(col("event_id"), col("event_type"), col("asof_value").as("rate"))
        .orderBy("event_id")
    }),

    "q_pq_codes" -> ((s, d) => {
      // product-quantization codes with the PORTABLE iters=0 codebook
      // (hash-sampled vectors, float-exact — no averaging), so the DuckDB
      // oracle reproduces the argmin L2 codes bit-for-bit; Lloyd-refined
      // codebooks are covered by SimilarityOpsSpec recall floors instead
      val emb = t(s, d, "embeddings")
      val cb = SimilarityOps.pqTrainCodebook(emb, "vec_id", "embedding",
        m = 8, ksub = 16, iters = 0)
      val codes = SimilarityOps.pqEncode(emb, "vec_id", "embedding", cb)
      codes.select(col("id").as("vec_id") +:
        (0 until 8).map(sub =>
          element_at(col("codes"), sub + 1).cast("int").as(s"c$sub")): _*)
        .orderBy("vec_id")
    }),

    "q_sample_token_budget" -> ((s, d) => {
      // sample sized to a TOKEN budget (50k of the corpus' ~250k):
      // integer per-million rate from one token-total agg, then the
      // zero-shuffle hash keep filter
      val docs = t(s, d, "documents")
        .withColumn("n_tok", size(TextOps.words(col("text"))).cast("long"))
      TrainingOps.sampleToTokenBudget(docs, "doc_id", "n_tok", 50000L)
        .select("doc_id", "n_tok").orderBy("doc_id")
    }),

    "q_shuffle_shards" -> ((s, d) =>
      // deterministic global shuffle: hash-shard + in-shard rank, the
      // pre-training corpus randomization (reproducible, no RNG state)
      TrainingOps.shuffleShards(t(s, d, "documents"), "doc_id", 8)
        .select(col("doc_id"), col("shard").cast("int").as("shard"), col("pos"))
        .orderBy("doc_id")),

    "q_sample_temperature" -> ((s, d) =>
      // temperature-flattened domain mixture (alpha=0.5): per-language
      // quotas proportional to sqrt(n), deterministic hash-threshold keep
      TrainingOps.temperatureSample(t(s, d, "documents"), "doc_id", "lang",
          targetTotal = 2000)
        .select("doc_id", "lang").orderBy("doc_id")),

    "q_url_canonical" -> ((s, d) => {
      // crawl-corpus URL normalization before URL-level dedup; the corpus
      // has no URL column, so synthesize messy-but-real-shaped URLs (same
      // construction oracle-side) and check the canonical string byte-exact
      val urls = t(s, d, "documents").select(col("doc_id"),
        concat(lit("HTTPS://WWW.Example"),
          pmod(col("doc_id"), lit(50)).cast("string"),
          lit(".com:443/Path/"), col("doc_id").cast("string"),
          lit("?id="), pmod(col("doc_id"), lit(7)).cast("string"),
          lit("&utm_source=feed&utm_campaign=X#Frag")).as("url"))
      urls.select(col("doc_id"), col("url"),
          TextOps.canonicalizeUrl(col("url")).as("url_canonical"))
        .orderBy("doc_id")
    }),

    "q_decontaminate" -> ((s, d) => {
      // GPT-3-style test-set decontamination: docs sharing any word bigram
      // with a (deterministic pseudo-)eval subset, with distinct-overlap
      // counts; the eval side broadcasts, the corpus never shuffles
      val docs = t(s, d, "documents")
      TrainingOps.decontaminate(
          docs.filter(pmod(col("doc_id"), lit(97)) =!= 0), "doc_id", "text",
          docs.filter(pmod(col("doc_id"), lit(97)) === 0), "text", n = 2)
        .orderBy("id")
    }),

    "q_pack_sequences" -> ((s, d) =>
      // GPT-style packing: per-source token offsets + training-chunk range
      TrainingOps.packSequences(
          t(s, d, "documents")
            .withColumn("n_tok", size(TextOps.words(col("text")))),
          "doc_id", "n_tok", "source", capacity = 512)
        .select(col("doc_id"), col("source"),
          col("offset").cast("long").as("offset"),
          col("chunk_first").cast("long").as("chunk_first"),
          col("chunk_last").cast("long").as("chunk_last"))
        .orderBy("doc_id")),

    "q_vocab_topk" -> ((s, d) =>
      // pre-tokenizer corpus report: most frequent words + doc frequency
      TrainingOps.vocabStats(t(s, d, "documents"), "doc_id", "text", topK = 50)),

    "q_quantize_int8" -> ((s, d) =>
      // int8 embedding quantization, verified through per-vector integer
      // aggregates (array formatting differs across engines; sums do not)
      TrainingOps.quantizeInt8(t(s, d, "embeddings"), "embedding")
        .select(col("vec_id"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          aggregate(col("q"), lit(0L), (a, x) => a + abs(x)).as("q_l1"),
          array_min(col("q")).cast("long").as("q_min"),
          array_max(col("q")).cast("long").as("q_max"))
        .orderBy("vec_id")),

    "q_dedup_simhash_portable" -> ((s, d) =>
      // portable-arithmetic simhash near-dups — the hard-signal variant of
      // q_dedup_simhash (whose xxhash64 signature DuckDB cannot reproduce)
      DedupOps.simhashNearDups(t(s, d, "documents"), "doc_id", "text",
          maxHamming = 2, bits = 16, portable = true)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")),

    "q_ann_top1" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      SimilarityOps.bruteForceTopK(e, e, "vec_id", "embedding", 1)
        .select("query_id", "neighbor_id").orderBy("query_id")
    }),

    "q_ann_lsh_top1" -> ((s, d) => {
      // multi-table LSH ANN under the HARD signal: the deterministic
      // hyperplane family is portable integer+IEEE arithmetic, so the
      // DuckDB oracle reproduces signatures, buckets, candidates AND the
      // exact-cosine rank — the engine's recall curve itself is verified,
      // not just spec-pinned.
      val e = t(s, d, "embeddings")
      SimilarityOps.lshTopK(e, "vec_id", "embedding", k = 1, bits = 4, tables = 2)
        .select("query_id", "neighbor_id").orderBy("query_id")
    }),

    "q_embed_neardup" -> ((s, d) => {
      val e = t(s, d, "embeddings").select("vec_id", "embedding")
      val dups = e.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      SimilarityOps.embeddingNearDups(e.unionByName(dups), "vec_id", "embedding",
          bits = 8, minCosine = 0.9999)
        .select("id_a", "id_b").orderBy("id_a", "id_b")
    }),

    // ---- further built-in coverage (SURVEY §2.4 A8, §2.5, §2.7) ---------
    "q_cube" -> ((s, d) =>
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)),

    "q_window_rolling" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      t(s, d, "events")
        .withColumn("rolling_sum", sum("event_id").over(w))
        .select("event_id", "rolling_sum").orderBy("event_id")
    }),

    "q_mask_secret" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          Monitor.maskSecret(col("c_name"), 5).as("masked"))
        .orderBy("c_custkey")),

    "q_approx_distinct" -> ((s, d) =>
      // HLL sketch (A8) — engine-specific estimate, rows-only check;
      // ApproxSpec asserts the estimate is within 5% of exact
      t(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")),

    "q_window_plan" -> ((s, d) =>
      // ST3: the run plan — per content type, <=24h windows covering a
      // 100h look-back ending at BaseEpoch+168h (epochs as ints so the
      // oracle is exact)
      Windows.planDf(s, Schemas.ContentTypes,
          Parse.BaseEpoch + Parse.SpanSeconds, 100)
        .select(col("content_type"),
          col("window_start").cast("long").as("ws"),
          col("window_end").cast("long").as("we"))
        .orderBy("content_type", "ws")),

    "q_graylog_timestamp" -> ((s, d) =>
      // P3: the Graylog enrich — parse + reformat to millisecond precision
      t(s, d, "events")
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS").as("timestamp"))
        .orderBy("event_id")),

    "q_median" -> ((s, d) =>
      // exact percentile (not the approx sketch) per group
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(floor(expr("percentile(l_quantity, 0.5)")).cast("long").as("median_qty"))
        .orderBy("l_returnflag")),

    "q_pipeline_prtg" -> ((s, d) =>
      // flagship pipeline over the synthesized 100k-row sequences table —
      // PRTG sensor counts per (content_type, operation). Every field
      // derivation is portable affine arithmetic (Parse.mix), so the DuckDB
      // oracle reproduces the ENTIRE parse → filter → route chain from
      // range(100000). Fixed n so the oracle SQL is static.
      Pipeline.routedRecords(DataGen.sequences(s, 100000L), DataGen.routingRules)
        .groupBy("content_type", "operation").agg(count(lit(1)).as("cnt"))
        .orderBy("content_type", "operation")),

    "q_retry_ledger" -> ((s, d) => {
      // ST6 transport half: bounded-retry accounting over a deterministic
      // flaky source (60% failure per attempt, affine-mix streams 101-103,
      // reproduced exactly by the DuckDB oracle). blobs_retried (ok but
      // needed >1 try) and the give-up errors are distinct from the
      // JsonIngest poison quarantine.
      val ev = t(s, d, "events").select(col("event_id"), col("event_type"))
      RetryLedger.run(ev, "event_id", maxAttempts = 3)(
          RetryLedger.affineFailure(600))
        .groupBy("event_type", "status")
        .agg(count(lit(1)).as("cnt"),
          sum(col("attempts").cast("long")).as("attempts_total"),
          sum(when(col("attempts") > 1, 1L).otherwise(0L)).as("retried"))
        .orderBy("event_type", "status")
    }),

    "q_media_decode" -> ((s, d) => {
      // multimodal: REAL byte-level PGM/WAV/Y4M decode (all codec-free
      // formats), poison rows surfaced via ok=false; rows-only (no
      // SQL-expressible oracle for binary decode)
      val media = Multimodal.syntheticMedia(s, 1000L, 8)
      Multimodal.decode(media).toDF()
        .groupBy("media_type", "ok")
        .agg(count(lit(1)).as("cnt"), sum(col("n_frames").cast("long")).as("frames"))
        .orderBy("media_type", "ok")
    })
  )

  /** DuckDB CTEs for the 16-bit portable simhash: bit j of the signature is
    * the sign of Σ_words ±1 votes on bit j of the affine-mixed poly hash —
    * the 16 bit terms are generated here. Ends with `sig(doc_id, sim)`. */
  private def simhashPortableCtes: String = {
    val bitTerms = (0 until 16).map { j =>
      val div = 1L << j
      s"""CASE WHEN list_sum(list_transform(hs, x ->
            CASE WHEN (x // $div) % 2 = 1 THEN 1 ELSE -1 END)) >= 0
          THEN ${1L << j} ELSE 0 END"""
    }.mkString(" + ")
    s"""w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
        h AS (SELECT doc_id, list_transform(ws, wd ->
          (list_reduce(list_prepend(0::BIGINT, list_transform(
             string_split_regex(wd, ''), c -> ascii(c)::BIGINT)),
             (acc, x) -> (acc * 31 + x) % 1000000007) * 654435748 + 1013904223)
          % 1000000007) AS hs FROM w),
        sig AS (SELECT doc_id, CAST($bitTerms AS BIGINT) AS sim FROM h)"""
  }

  private def simhashOracleSql: String =
    s"""WITH $simhashPortableCtes
        SELECT doc_id, sim AS simhash16 FROM sig ORDER BY doc_id"""

  /** Reproduces simhashNearDups(maxHamming=2, bits=16, portable=true):
    * 3 pigeonhole chunks (6+6+4 bits) gate candidates, exact hamming via
    * bit_count(xor) verifies. */
  private def simhashNearDupsOracleSql: String =
    s"""WITH $simhashPortableCtes,
        ch AS (SELECT doc_id, sim,
          sim % 64 AS c0, (sim // 64) % 64 AS c1, (sim // 4096) % 16 AS c2
        FROM sig)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
        FROM ch a JOIN ch b ON a.doc_id < b.doc_id
          AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2)
        WHERE bit_count(xor(a.sim, b.sim)) <= 2
        ORDER BY id_a, id_b"""

  /** DuckDB shingle-set expression over a words-list column `ws` —
    * mirrors Hashing.shingleHashes INCLUDING the short-text padding: a doc
    * with fewer than n=2 words still yields ONE (clipped) shingle
    * (count = max(words-n+1, 1)), so the range runs to max(len-1, 1) and
    * the final window truncates. Without this, `range(1, len(ws))` is
    * EMPTY for one-word docs and every shingle-based oracle silently
    * diverges from the engine on short texts. */
  private def shingleSetSql(ws: String): String =
    s"""list_distinct(list_transform(range(1, greatest(len($ws), 2)), i ->
        list_reduce(list_prepend(0::BIGINT, list_transform(
          string_split_regex(CASE WHEN CAST(i AS INT) + 1 <= len($ws)
            THEN $ws[i] || ' ' || $ws[i+1] ELSE $ws[i] END, ''),
          c -> ascii(c)::BIGINT)),
          (acc, x) -> (acc * 31 + x) % 1000000007)))"""

  /** Shared DuckDB CTE prefix reproducing minhashNearDups(n=2, k=8,
    * bands=4, 60%): shingle poly-hashes → 8 affine minhashes
    * (A_i = 2654435761 mod P + 2i+1, B_i = 1013904223 + 7919i, i=0..7) →
    * 4 band hashes of 2 rows → candidates where any band collides → exact
    * Jaccard verify. Ends with a `pr(id_a, id_b, inter_size, union_size)`
    * CTE (unordered). */
  private def minhashPairsCtes: String = {
    val P = 1000000007L
    def a(i: Int) = 2654435761L % P + 2L * i + 1L
    def b(i: Int) = 1013904223L + 7919L * i
    val mins = (0 until 8).map(i =>
      s"list_min(list_transform(sh, h -> (h * ${a(i)} + ${b(i)}) % $P)) AS m$i")
      .mkString(", ")
    val bandCols = (0 until 4).map(bb =>
      s"(m${2 * bb} * 31 + m${2 * bb + 1}) % $P AS b$bb").mkString(", ")
    val anyBand = (0 until 4).map(bb => s"a.b$bb = b.b$bb").mkString(" OR ")
    s"""w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
        s AS (SELECT doc_id, ${shingleSetSql("ws")} AS sh FROM w),
        sig AS (SELECT doc_id, sh, $mins FROM s),
        banded AS (SELECT doc_id, sh, $bandCols FROM sig),
        pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter_size,
          CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS union_size
        FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ($anyBand)
        WHERE len(list_intersect(a.sh, b.sh)) * 100 >=
              len(list_distinct(list_concat(a.sh, b.sh))) * 60)"""
  }

  private def minhashLshOracleSql: String =
    s"""WITH $minhashPairsCtes
        SELECT id_a, id_b, inter_size, union_size FROM pr ORDER BY id_a, id_b"""

  /** Connected components in SQL: transitive closure via a recursive CTE
    * (min reachable doc id per node = the cluster label). */
  private def dedupClustersOracleSql: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
        edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                  UNION ALL SELECT id_b, id_a FROM pr),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
        )
        SELECT id, min(r) AS cluster,
               CAST(min(r) = id AS INT) AS is_canonical
        FROM reach GROUP BY id ORDER BY id"""

  /** Survivors = docs whose connected-component min label is themselves
    * (same recursive-CTE closure as q_dedup_clusters, joined back to the
    * full documents row). */
  private def dedupSurvivorsOracleSql: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
        edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                  UNION ALL SELECT id_b, id_a FROM pr),
        reach(id, r) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
        ),
        surv AS (SELECT id FROM reach GROUP BY id HAVING min(r) = id)
        SELECT d.doc_id, d.lang FROM documents d
        JOIN surv s ON s.id = d.doc_id
        ORDER BY d.doc_id"""

  /** The flagship pipeline, reproduced end to end in DuckDB: the same
    * affine mixes (Parse.mix family, A_s = 2654435761 mod P + 2s+1,
    * B_s = 1013904223 + 7919s) derive content_type / operation / Policy
    * from range(100000); the same absent-key-passes rules filter; the same
    * (content_type, operation) rollup. */
  private def pipelinePrtgOracleSql: String = {
    val P = 1000000007L
    def a(s: Int) = 2654435761L % P + 2L * s + 1L
    def b(s: Int) = 1013904223L + 7919L * s
    def m(s: Int) = s"((i * ${a(s)} + ${b(s)}) % $P)"
    val ops = Schemas.Operations.map(o => s"'$o'").mkString("[", ",", "]")
    s"""WITH ids AS (SELECT unnest(range(100000)) AS i),
        f AS (SELECT
          CASE WHEN ${m(1)} % 100 < 50 THEN 'Audit.General'
               WHEN ${m(1)} % 100 < 70 THEN 'Audit.AzureActiveDirectory'
               WHEN ${m(1)} % 100 < 85 THEN 'Audit.Exchange'
               WHEN ${m(1)} % 100 < 95 THEN 'Audit.SharePoint'
               ELSE 'DLP.All' END AS content_type,
          $ops[CAST(${m(3)} % 12 AS INT) + 1] AS operation,
          ${m(6)} % 10 AS h_pp, ${m(7)} % 4 AS h_pv
        FROM ids),
        g AS (SELECT content_type, operation,
          CASE WHEN content_type = 'Audit.General' AND h_pp <> 0
               THEN CASE WHEN h_pv = 0 THEN 'Spoof' ELSE 'Phish' END
          END AS policy
        FROM f)
        SELECT content_type, operation, count(*) AS cnt FROM g
        WHERE (content_type <> 'Audit.General' OR policy IS NULL OR policy = 'Spoof')
          AND (content_type <> 'Audit.AzureActiveDirectory' OR operation = 'UserLoginFailed')
          AND (content_type <> 'Audit.SharePoint' OR operation = 'FileDeleted')
        GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** Reproduces RetryLedger.run(maxAttempts=3, affineFailure(600)): attempt
    * `a` of event_id fails iff mix_{100+a}(event_id) mod 1000 < 600. */
  private def retryLedgerOracleSql: String = {
    val P = 1000000007L
    def a(s: Int) = 2654435761L % P + 2L * s + 1L
    def b(s: Int) = 1013904223L + 7919L * s
    def f(att: Int) = {
      val s = 100 + att
      s"(((event_id % $P) * ${a(s)} + ${b(s)}) % $P % 1000 < 600)"
    }
    s"""WITH s AS (SELECT event_type,
          CASE WHEN NOT ${f(1)} THEN 1 WHEN NOT ${f(2)} THEN 2 ELSE 3 END AS attempts,
          CASE WHEN NOT ${f(1)} OR NOT ${f(2)} OR NOT ${f(3)} THEN 'ok'
               ELSE 'error' END AS status
        FROM events)
        SELECT event_type, status, count(*) AS cnt,
          CAST(sum(attempts) AS BIGINT) AS attempts_total,
          CAST(sum(CASE WHEN attempts > 1 THEN 1 ELSE 0 END) AS BIGINT) AS retried
        FROM s GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** Reproduces lshTopK(k=1, bits=4, tables=2): per table t, bit i of the
    * signature is the sign of Σ_d x_d·plane(t·4+i, d) with
    * plane(p, d) = ((d·(2654435761+40503p) + 97531p+12345) mod 1000003) /
    * 500001.5 − 1 — integer mixes are exact and the double fold order
    * matches Hashing.lshSignature, so signatures are bit-identical;
    * candidates share a (table, sig) bucket; exact cosine ranks them. */
  private def annLshOracleSql: String = {
    val bits = 4
    def planeExpr(p: Int): String =
      s"(((d * ${2654435761L + 40503L * p} + ${97531L * p + 12345L}) % 1000003)::DOUBLE / 500001.5 - 1.0)"
    def projExpr(p: Int): String =
      s"""list_reduce(list_prepend(0.0, list_transform(range(0, len(e)),
          d -> e[CAST(d AS INT) + 1] * ${planeExpr(p)})), (acc, x) -> acc + x)"""
    def sigExpr(t: Int): String =
      (0 until bits).map(i =>
        s"(CASE WHEN ${projExpr(t * bits + i)} >= 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
    val cos =
      """list_reduce(list_prepend(0.0, list_transform(range(1, len(va.e)+1), i -> va.e[i]*vb.e[i])), (acc,x) -> acc+x) /
         (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(va.e)+1), i -> va.e[i]*va.e[i])), (acc,x) -> acc+x)) *
          sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(vb.e)+1), i -> vb.e[i]*vb.e[i])), (acc,x) -> acc+x)))"""
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        sg AS (SELECT vec_id, 0 AS tbl, CAST(${sigExpr(0)} AS BIGINT) AS sig FROM v
               UNION ALL
               SELECT vec_id, 1 AS tbl, CAST(${sigExpr(1)} AS BIGINT) AS sig FROM v),
        cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
                 FROM sg a JOIN sg b ON a.tbl = b.tbl AND a.sig = b.sig
                 WHERE a.vec_id <> b.vec_id),
        p AS (SELECT c.query_id, c.neighbor_id, $cos AS sim
              FROM cand c
              JOIN v va ON va.vec_id = c.query_id
              JOIN v vb ON vb.vec_id = c.neighbor_id),
        r AS (SELECT query_id, neighbor_id,
                row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
              FROM p)
        SELECT query_id, neighbor_id FROM r WHERE rn = 1 ORDER BY query_id"""
  }

  /** DuckDB-runnable oracles; table names resolve to the same parquet. */
  def oracleSql: Map[String, String] = Map(
    "q_retry_ledger" -> retryLedgerOracleSql,
    "q_ann_lsh_top1" -> annLshOracleSql,
    "q_simhash_portable" -> simhashOracleSql,
    "q_dedup_simhash_portable" -> simhashNearDupsOracleSql,
    "q_pipeline_prtg" -> pipelinePrtgOracleSql,
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         count(*) AS cnt,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "q_route_count" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
    "q_filter_absent_key_passes" ->
      """SELECT event_type, count(*) AS cnt FROM (
           SELECT event_type, json_extract_string(props, '$.plan') AS plan FROM events
         ) WHERE plan IS NULL OR plan = 'premium'
         GROUP BY 1 ORDER BY 1""",
    "q_proj_string_funcs" ->
      """SELECT doc_id, replace(lang, '.', '_') AS log_type,
         lower(source) AS src_lower,
         length(text) AS text_len, substring(text, 1, 8) AS prefix
         FROM documents ORDER BY doc_id""",
    "q_date_funcs" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
         CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS sec_of_day
         FROM events ORDER BY event_id""",
    "q_window_split_24h" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start,
         count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1""",
    "q_join_broadcast_enrich" ->
      """SELECT r_name, count(*) AS cnt FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q_join_anti_dedup" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         ORDER BY c_custkey""",
    "q_join_outer" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",
    "q_topk" ->
      """SELECT o_orderkey, o_custkey FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q_union_schema" ->
      """SELECT seg, count(*) AS cnt FROM (
           SELECT c_name AS name, c_mktsegment AS seg FROM customer
           UNION ALL
           SELECT s_name AS name, '' AS seg FROM supplier
         ) GROUP BY 1 ORDER BY 1""",
    "q_duplicate_explode" ->
      """SELECT r_name, count(*) AS cnt FROM region
         CROSS JOIN (SELECT unnest(range(3))) AS g
         GROUP BY 1 ORDER BY 1""",
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey FROM (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders
         ) WHERE rn = 1 ORDER BY o_custkey""",
    "q_checksum_orderless" ->
      """SELECT event_type,
         bit_xor(event_id * 2654435761 + user_id) AS checksum
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
         INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY 1""",
    "q_except" ->
      """SELECT n_nationkey AS nk FROM nation
         EXCEPT SELECT s_nationkey AS nk FROM supplier ORDER BY 1""",
    "q_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.plan') AS plan,
         json_extract_string(props, '$.device') AS device
         FROM events ORDER BY event_id""",
    "q_hash_md5" ->
      "SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id",
    // DuckDB's json_extract ERRORS on malformed JSON (no PERMISSIVE mode),
    // so validity is gated explicitly with json_valid — same split as
    // Spark's from_json-IS-NULL.
    "q_json_corrupt" ->
      """WITH p AS (SELECT event_type,
           CASE WHEN event_id % 7 = 0 THEN '!corrupt!' || substring(props, 1, 5)
                ELSE props END AS payload
         FROM events)
         SELECT event_type,
           CASE WHEN json_valid(payload) THEN 'parsed' ELSE 'quarantined' END AS status,
           count(*) AS cnt,
           CAST(sum(CASE WHEN json_valid(payload)
                         THEN CAST(json_extract(payload, '$.k') AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_k
         FROM p GROUP BY 1, 2 ORDER BY 1, 2""",
    // row_number, NOT per-column min(): exactDedup keeps the whole first
    // ROW per key — min(doc_id) + min(lang) computed independently would
    // stitch together values from different rows whenever duplicate texts
    // span languages (caught by an sf0.1 sweep; sf0.01 has no such pair)
    "q_dedup_exact" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           FROM (SELECT doc_id, text, lang FROM documents
                 UNION ALL SELECT doc_id + 10000, text, lang FROM documents)
         ) WHERE rn = 1 ORDER BY doc_id""",
    "q_text_stats" ->
      """WITH w AS (SELECT doc_id, text,
             string_split_regex(trim(text), '\s+') AS ws FROM documents)
         SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(floor(length(array_to_string(ws, '')) * 1000.0 / len(ws)) AS BIGINT)
             AS mean_word_len_x1000,
           CAST(floor(len(list_distinct(ws)) * 1000.0 / len(ws)) AS BIGINT)
             AS distinct_ratio_x1000,
           CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT)
             AS n_punct,
           CAST(len(list_intersect(list_distinct(ws),
             ['the','a','of','and','to','in','is','it','that','for'])) AS BIGINT)
             AS stopword_hits
         FROM w ORDER BY doc_id""",
    "q_dedup_spans_cdc" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
         t AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos1, ws FROM w),
         x AS (SELECT doc_id, CAST(pos1 AS INT) AS pos, ws[CAST(pos1 AS INT)] AS wd FROM t),
         f AS (SELECT doc_id, pos, wd,
           CASE WHEN pos > 1 AND
             list_reduce(list_prepend(0::BIGINT, list_transform(
               string_split_regex(wd, ''), c -> ascii(c)::BIGINT)),
               (acc, x) -> (acc * 31 + x) % 1000000007) % 8 = 0
           THEN 1 ELSE 0 END AS b FROM x),
         c AS (SELECT doc_id, pos, wd,
           sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS cid FROM f),
         ch AS (SELECT doc_id, cid, min(pos) AS idx,
           string_agg(wd, ' ' ORDER BY pos) AS chunk FROM c GROUP BY doc_id, cid),
         k AS (SELECT doc_id, idx, chunk,
           row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn FROM ch)
         SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_kept,
                string_agg(chunk, ' ' ORDER BY idx) AS text_deduped
         FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""",
    "q_dedup_spans" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
         c AS (SELECT doc_id, unnest(range(0, greatest(CAST(ceil(len(ws) / 8.0) AS INT), 1))) AS idx, ws FROM w),
         ch AS (SELECT doc_id, CAST(idx AS INT) AS idx,
                  array_to_string(ws[(CAST(idx AS INT) * 8 + 1):(CAST(idx AS INT) * 8 + 8)], ' ') AS chunk FROM c),
         k AS (SELECT doc_id, idx, chunk,
                  row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn FROM ch)
         SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_kept,
                string_agg(chunk, ' ' ORDER BY idx) AS text_deduped
         FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id""",
    "q_text_redact" ->
      """WITH p AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) ||
           '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS text
         FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS text_redacted
         FROM p ORDER BY doc_id""",
    "q_text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
         g AS (SELECT doc_id,
           CASE WHEN len(ws) >= 2
             THEN list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))
             ELSE [array_to_string(ws, ' ')] END AS g2,
           greatest(len(ws) - 1, 1) AS t2,
           CASE WHEN len(ws) >= 3
             THEN list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
             ELSE [array_to_string(ws, ' ')] END AS g3,
           greatest(len(ws) - 2, 1) AS t3
         FROM w)
         SELECT doc_id,
           CAST(1000 - floor(len(g2) * 1000.0 / t2) AS BIGINT) AS dup_2gram_frac_x1000,
           CAST(1000 - floor(len(g3) * 1000.0 / t3) AS BIGINT) AS dup_3gram_frac_x1000
         FROM g ORDER BY doc_id""",
    "q_text_repetition_gopher" ->
      """WITH p AS (SELECT doc_id,
           text || chr(10) || text || chr(10) || 'unique ' || CAST(doc_id AS VARCHAR) AS text
         FROM documents),
         l AS (SELECT doc_id, string_split(text, chr(10)) AS ls,
                      string_split_regex(trim(text), '\s+') AS ws FROM p),
         lc AS (SELECT doc_id, line, count(*) AS cnt, length(line) AS ln
                FROM (SELECT doc_id, unnest(ls) AS line FROM l) GROUP BY doc_id, line),
         lstat AS (SELECT doc_id, sum((cnt - 1) * ln) AS dupc, sum(cnt * ln) AS totc,
                          sum(cnt) AS nl, count(*) AS dl FROM lc GROUP BY doc_id),
         g2 AS (SELECT doc_id, max(cnt * length(g)) AS sc FROM (
             SELECT doc_id, g, count(*) AS cnt FROM (
               SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
                 THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
                 ELSE [array_to_string(ws, ' ')] END) AS g FROM l) GROUP BY doc_id, g)
           GROUP BY doc_id),
         g3 AS (SELECT doc_id, max(cnt * length(g)) AS sc FROM (
             SELECT doc_id, g, count(*) AS cnt FROM (
               SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
                 THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                 ELSE [array_to_string(ws, ' ')] END) AS g FROM l) GROUP BY doc_id, g)
           GROUP BY doc_id),
         g4 AS (SELECT doc_id, max(cnt * length(g)) AS sc FROM (
             SELECT doc_id, g, count(*) AS cnt FROM (
               SELECT doc_id, unnest(CASE WHEN len(ws) >= 4
                 THEN list_transform(range(1, len(ws) - 2), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
                 ELSE [array_to_string(ws, ' ')] END) AS g FROM l) GROUP BY doc_id, g)
           GROUP BY doc_id)
         SELECT l.doc_id,
           CAST(1000 - floor(lstat.dl * 1000.0 / greatest(lstat.nl, 1)) AS BIGINT) AS dup_line_frac_x1000,
           CAST(floor(lstat.dupc * 1000.0 / greatest(lstat.totc, 1)) AS BIGINT) AS dup_line_char_frac_x1000,
           CAST(CASE WHEN len(l.ws) < 2 THEN 0 ELSE floor(g2.sc * 1000.0 / greatest(length(array_to_string(l.ws, ' ')), 1)) END AS BIGINT) AS top_2gram_char_frac_x1000,
           CAST(CASE WHEN len(l.ws) < 3 THEN 0 ELSE floor(g3.sc * 1000.0 / greatest(length(array_to_string(l.ws, ' ')), 1)) END AS BIGINT) AS top_3gram_char_frac_x1000,
           CAST(CASE WHEN len(l.ws) < 4 THEN 0 ELSE floor(g4.sc * 1000.0 / greatest(length(array_to_string(l.ws, ' ')), 1)) END AS BIGINT) AS top_4gram_char_frac_x1000
         FROM l JOIN lstat USING (doc_id) JOIN g2 USING (doc_id)
                JOIN g3 USING (doc_id) JOIN g4 USING (doc_id)
         ORDER BY doc_id""",
    "q_text_quality_gopher" ->
      """WITH p AS (SELECT doc_id,
           text || chr(10) || '- bullet item ' || CAST(doc_id % 5 AS VARCHAR)
                || chr(10) || 'to be continued' || CASE WHEN doc_id % 3 = 0 THEN '...' ELSE '' END
                || chr(10) || '# 42 ###' AS text FROM documents),
         w AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS ws,
                string_split(text, chr(10)) AS ls FROM p),
         sig AS (SELECT doc_id, ws, ls,
           greatest(len(ws), 1) AS nw, greatest(len(ls), 1) AS nl,
           length(text) - length(replace(text, '#', '')) AS hashes,
           len(regexp_extract_all(text, '(\.\.\.|…)')) AS ell,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(floor(length(array_to_string(ws, '')) * 1000.0 / greatest(len(ws), 1)) AS BIGINT) AS mwl,
           len(list_intersect(list_distinct(ws),
             ['the','a','of','and','to','in','is','it','that','for'])) AS sw
         FROM w),
         m AS (SELECT doc_id, n_words, mwl, sw,
           CAST(floor((hashes + ell) * 1000.0 / nw) AS BIGINT) AS symbol_word_ratio_x1000,
           CAST(floor(len(list_filter(ls, l -> regexp_matches(l, '^[-*•]'))) * 1000.0 / nl) AS BIGINT) AS bullet_line_frac_x1000,
           CAST(floor(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)$'))) * 1000.0 / nl) AS BIGINT) AS ellipsis_line_frac_x1000,
           CAST(floor(len(list_filter(ws, x -> regexp_matches(x, '\p{L}'))) * 1000.0 / nw) AS BIGINT) AS alpha_word_frac_x1000
         FROM sig)
         SELECT doc_id, symbol_word_ratio_x1000, bullet_line_frac_x1000,
           ellipsis_line_frac_x1000, alpha_word_frac_x1000,
           CAST(n_words >= 5 AND n_words <= 100000
             AND mwl >= 3000 AND mwl <= 10000
             AND symbol_word_ratio_x1000 <= 100
             AND bullet_line_frac_x1000 <= 900
             AND ellipsis_line_frac_x1000 <= 300
             AND alpha_word_frac_x1000 >= 800
             AND sw >= 2 AS BIGINT) AS gopher_keep
         FROM m ORDER BY doc_id""",
    "q_text_langid" ->
      """WITH w AS (SELECT doc_id, lang,
             list_distinct(string_split_regex(trim(text), '\s+')) AS dw FROM documents)
         SELECT doc_id, lang,
           ['en','de','fr','es','zh'][(greatest(
             len(list_intersect(dw, ['the','a','of','and','to','in','is','it','that','for']))::BIGINT * 8 + 0,
             len(list_intersect(dw, ['der','die','das','und','ist','nicht','ein','mit','auf','zu']))::BIGINT * 8 + 1,
             len(list_intersect(dw, ['le','la','et','les','des','un','une','est','dans','que']))::BIGINT * 8 + 2,
             len(list_intersect(dw, ['el','la','y','los','las','un','una','es','en','que']))::BIGINT * 8 + 3,
             len(list_intersect(dw, ['的','是','了','在','和','有','我','不','这','人']))::BIGINT * 8 + 4
           ) % 8 + 1)::INT] AS lang_pred
         FROM w ORDER BY doc_id""",
    "q_text_fingerprint" ->
      """SELECT doc_id,
           list_reduce(list_prepend(0::BIGINT, list_transform(
             string_split_regex(array_to_string(
               string_split_regex(trim(text), '\s+'), ' '), ''),
             c -> ascii(c)::BIGINT)),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
         FROM documents ORDER BY doc_id""",
    "q_minhash_signature" ->
      s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
         s AS (SELECT doc_id, ${shingleSetSql("ws")} AS sh FROM w)
         SELECT doc_id,
           list_min(list_transform(sh, h -> (h * 654435748 + 1013904223) % 1000000007)) AS m0,
           list_min(list_transform(sh, h -> (h * 654435750 + 1013912142) % 1000000007)) AS m1
         FROM s ORDER BY doc_id""",
    // Reproduces the Spark side's FULL LSH pipeline — k=8 minhashes, 4
    // bands of 2, candidate iff ANY band hash collides, then exact Jaccard
    // ≥ 60% — so the oracle has the same recall curve (an exhaustive
    // all-pairs oracle would spuriously fail whenever banding misses a
    // borderline pair). Band hash b = (m_{2b}*31 + m_{2b+1}) mod P, the
    // polynomial fold DedupOps.bandedSignature computes over the slice.
    "q_dedup_minhash_lsh" -> minhashLshOracleSql,
    "q_dedup_clusters" -> dedupClustersOracleSql,
    "q_dedup_survivors" -> dedupSurvivorsOracleSql,
    "q_vocab_topk" ->
      """SELECT word, count(*) AS occurrences,
           count(DISTINCT doc_id) AS doc_freq
         FROM (SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\s+')) AS word
               FROM documents)
         GROUP BY word ORDER BY occurrences DESC, word LIMIT 50""",
    "q_quantize_int8" ->
      """WITH q AS (SELECT vec_id,
           list_transform(embedding, x ->
             CASE WHEN m > 0 THEN CAST(floor(x::DOUBLE * 127 / m) AS BIGINT)
                  ELSE 0 END) AS qv
         FROM (SELECT vec_id, embedding,
                 list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
               FROM embeddings))
         SELECT vec_id,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max
         FROM q ORDER BY vec_id""",
    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
         WHERE ((doc_id % 1000000007) * 654435794 + 1014086360) % 1000000007 % 1000 <
           CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 WHEN 'zh' THEN 100
                     ELSE 1000 END
         ORDER BY doc_id""",
    "q_sessionize" ->
      """WITH o AS (SELECT event_id, user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         FROM events),
         b AS (SELECT event_id, user_id, ts,
           CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) >= 1800000000 THEN 1 ELSE 0 END AS br
         FROM o),
         s AS (SELECT event_id, user_id, ts,
           sum(br) OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS session_seq
         FROM b)
         SELECT event_id, user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(row_number() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) - 1 AS BIGINT) AS session_pos
         FROM s ORDER BY event_id""",
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t_1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t_2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t_1 GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t_3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t_2 GROUP BY e.user_id)
         SELECT s1.user_id, s1.t_1, s2.t_2, s3.t_3,
           CAST(1 + (CASE WHEN s2.t_2 IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN s3.t_3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS steps_completed
         FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         ORDER BY user_id""",
    "q_join_asof" ->
      """WITH rates AS (SELECT event_type, ts AS rts, max(value) AS rate
           FROM events WHERE event_id % 20 = 0 GROUP BY event_type, ts)
         SELECT e.event_id, e.event_type, r.rate
         FROM events e ASOF JOIN rates r
           ON e.event_type = r.event_type AND e.ts >= r.rts
         ORDER BY e.event_id""",
    "q_pq_codes" ->
      """WITH ranked AS (SELECT vec_id, embedding,
           row_number() OVER (ORDER BY
             ((vec_id % 1000000007) * 654435882 + 1014434796) % 1000000007, vec_id) - 1 AS cid
         FROM embeddings),
         init AS (SELECT cid, embedding AS cv FROM ranked WHERE cid < 16),
         pairs AS (SELECT e.vec_id, i.cid, g.s,
           list_reduce(list_prepend(0.0, list_transform(range(1, 9),
             d -> (CAST(e.embedding[CAST(g.s * 8 + d AS INT)] AS DOUBLE)
                   - CAST(i.cv[CAST(g.s * 8 + d AS INT)] AS DOUBLE))
                * (CAST(e.embedding[CAST(g.s * 8 + d AS INT)] AS DOUBLE)
                   - CAST(i.cv[CAST(g.s * 8 + d AS INT)] AS DOUBLE)))),
             (acc, x) -> acc + x) AS dist
         FROM embeddings e, init i, range(0, 8) g(s)),
         best AS (SELECT vec_id, s, cid,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rn
         FROM pairs)
         SELECT vec_id,
           CAST(max(CASE WHEN s = 0 THEN cid END) AS INT) AS c0,
           CAST(max(CASE WHEN s = 1 THEN cid END) AS INT) AS c1,
           CAST(max(CASE WHEN s = 2 THEN cid END) AS INT) AS c2,
           CAST(max(CASE WHEN s = 3 THEN cid END) AS INT) AS c3,
           CAST(max(CASE WHEN s = 4 THEN cid END) AS INT) AS c4,
           CAST(max(CASE WHEN s = 5 THEN cid END) AS INT) AS c5,
           CAST(max(CASE WHEN s = 6 THEN cid END) AS INT) AS c6,
           CAST(max(CASE WHEN s = 7 THEN cid END) AS INT) AS c7
         FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""",
    "q_sample_token_budget" ->
      """WITH n AS (SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
         FROM documents),
         t AS (SELECT sum(n_tok) AS tot FROM n),
         r AS (SELECT least(1000000, greatest(1, CAST(floor(50000 * 1000000.0 / tot) AS BIGINT))) AS rate FROM t)
         SELECT doc_id, n_tok FROM n, r
         WHERE ((doc_id % 1000000007) * 654435890 + 1014466472) % 1000000007 % 1000000 < rate
         ORDER BY doc_id""",
    "q_shuffle_shards" ->
      """WITH h AS (SELECT doc_id,
           ((doc_id % 1000000007) * 654435830 + 1014228902) % 1000000007 AS hh
         FROM documents)
         SELECT doc_id, CAST(hh % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
         FROM h ORDER BY doc_id""",
    "q_sample_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         w AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000.0) AS BIGINT) AS w FROM c),
         t AS (SELECT sum(w) AS tw FROM w),
         q AS (SELECT lang, n, least(n, CAST(floor(CAST(2000 AS DOUBLE) * w / tw) AS BIGINT)) AS quota FROM w, t)
         SELECT d.doc_id, d.lang FROM documents d
           JOIN q ON d.lang IS NOT DISTINCT FROM q.lang
         WHERE ((d.doc_id % 1000000007) * 654435862 + 1014355606) % 1000000007 % q.n < q.quota
         ORDER BY d.doc_id""",
    "q_url_canonical" ->
      """WITH u AS (SELECT doc_id,
           'HTTPS://WWW.Example' || CAST(doc_id % 50 AS VARCHAR) || '.com:443/Path/' ||
           CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id % 7 AS VARCHAR) ||
           '&utm_source=feed&utm_campaign=X#Frag' AS url FROM documents),
         s1 AS (SELECT doc_id, url,
           lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) ||
           substr(url, length(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) + 1) AS c FROM u),
         s2 AS (SELECT doc_id, url, regexp_replace(c, '#.*$', '', 'g') AS c FROM s1),
         s3 AS (SELECT doc_id, url,
           regexp_replace(regexp_replace(regexp_replace(c,
             '\?((?:utm_[a-z]+|fbclid|gclid)=[^&]*&)+', '?', 'g'),
             '&(?:utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
             '\?(?:utm_[a-z]+|fbclid|gclid)=[^&]*$', '') AS c FROM s2),
         s5 AS (SELECT doc_id, url,
           regexp_replace(c, '^(http://[^/?#:]*):80([/?]|$)', '\1\2') AS c FROM s3),
         s6 AS (SELECT doc_id, url,
           regexp_replace(c, '^(https://[^/?#:]*):443([/?]|$)', '\1\2') AS c FROM s5),
         s7 AS (SELECT doc_id, url, regexp_replace(c, '^([a-z][a-z0-9+.-]*://)www\.', '\1') AS c FROM s6)
         SELECT doc_id, url, regexp_replace(c, '/$', '') AS url_canonical
         FROM s7 ORDER BY doc_id""",
    "q_decontaminate" ->
      s"""WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
         s AS (SELECT doc_id, ${shingleSetSql("ws")} AS sh FROM w),
         ts AS (SELECT DISTINCT unnest(sh) AS tok FROM s WHERE doc_id % 97 = 0),
         ex AS (SELECT doc_id AS id, unnest(sh) AS tok FROM s WHERE doc_id % 97 <> 0)
         SELECT id, CAST(count(*) AS BIGINT) AS n_hits
         FROM ex JOIN ts USING (tok)
         GROUP BY id ORDER BY id""",
    "q_pack_sequences" ->
      """WITH n AS (SELECT doc_id, source,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
         FROM documents),
         o AS (SELECT doc_id, source, n_tok,
           CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
         FROM n)
         SELECT doc_id, source, "offset",
           "offset" // 512 AS chunk_first,
           ("offset" + n_tok - 1) // 512 AS chunk_last
         FROM o ORDER BY doc_id""",
    "q_dedup_ngram_jaccard" ->
      s"""WITH w AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
         s AS (SELECT doc_id, lang, ${shingleSetSql("ws")} AS sh FROM w)
         SELECT a.lang AS blk, a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter_size,
           CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS union_size
         FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
         WHERE len(list_intersect(a.sh, b.sh)) * 100 >=
               len(list_distinct(list_concat(a.sh, b.sh))) * 55
         ORDER BY blk, id_a, id_b""",
    "q_ann_top1" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
         p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           list_reduce(list_prepend(0.0, list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])), (acc,x) -> acc+x) /
           (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(a.e)+1), i -> a.e[i]*a.e[i])), (acc,x) -> acc+x)) *
            sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(b.e)+1), i -> b.e[i]*b.e[i])), (acc,x) -> acc+x))) AS sim
           FROM v a JOIN v b ON a.vec_id <> b.vec_id),
         r AS (SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
               FROM p)
         SELECT query_id, neighbor_id FROM r WHERE rn = 1 ORDER BY query_id""",
    "q_embed_neardup" ->
      """WITH u AS (SELECT vec_id, embedding FROM embeddings
                    UNION ALL SELECT vec_id + 100000, embedding FROM embeddings),
         v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM u)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM v a JOIN v b ON a.vec_id < b.vec_id
         WHERE list_reduce(list_prepend(0.0, list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i])), (acc,x) -> acc+x) /
           (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(a.e)+1), i -> a.e[i]*a.e[i])), (acc,x) -> acc+x)) *
            sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(b.e)+1), i -> b.e[i]*b.e[i])), (acc,x) -> acc+x))) >= 0.9999
         ORDER BY id_a, id_b""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
    "q_window_rolling" ->
      """SELECT event_id,
           CAST(sum(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_sum
         FROM events ORDER BY event_id""",
    "q_window_plan" ->
      """SELECT ct AS content_type, CAST(ws AS BIGINT) AS ws,
           CAST(least(ws + 86400, 1767830400) AS BIGINT) AS we
         FROM (SELECT unnest(['Audit.General','Audit.AzureActiveDirectory',
                              'Audit.Exchange','Audit.SharePoint','DLP.All']) AS ct)
         CROSS JOIN (SELECT unnest(range(1767470400, 1767830400, 86400)) AS ws)
         ORDER BY 1, 2""",
    "q_graylog_timestamp" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS timestamp
         FROM events ORDER BY event_id""",
    "q_median" ->
      """SELECT l_returnflag,
           CAST(floor(quantile_cont(l_quantity, 0.5)) AS BIGINT) AS median_qty
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_mask_secret" ->
      """SELECT c_custkey,
           CASE WHEN length(c_name) <= 5 THEN c_name
                ELSE repeat('*', 8) || right(c_name, 5) END AS masked
         FROM customer ORDER BY c_custkey"""
  )
}
