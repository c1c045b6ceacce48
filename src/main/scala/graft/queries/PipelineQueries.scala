package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Remaining SURVEY §2 scalar/shape families over the synthetic tables,
  * each oracle-checked: content-hash identity (P10/P11), stoichiometry
  * text equations (A2/P11), mass-change join (J12), path-length sort +
  * per-gen threshold lookup (W6/W7), and the multimodal binary-column
  * pipeline (stub decode, chunk math).
  */
/** Typed return row of q_multimodal_audio's decode UDF (top-level so
  * the encoder derives).
  */
final case class WavStats(
    n_samples: Long, duration_ms: Long, peak: Int,
    rms_x1000: Long, n_clipped: Long)

/** Typed return row of q_multimodal_phash's image roundtrip UDF. */
final case class PhashStats(phash: Long, px_sum: Long, px_sumsq: Long)

/** Typed return row of q_multimodal_dhash's image roundtrip UDF
  * (dHash split into 32-bit halves so the oracle's bit sums never
  * overflow a signed BIGINT).
  */
final case class DhashStats(dlo: Long, dhi: Long)

/** Typed return row of q_multimodal_audiofp's fingerprint UDF. */
final case class FpStats(
    n_frames: Long, peak_fp: Long, n_landmarks: Long, n_lids: Long,
    lm_fp: Long)

/** Typed return row of q_pipeline_audio's decode+fingerprint kernel:
  * real WAV decode verdict, exact sample count, and the landmark ids
  * (t*512+lid) — one kernel pass feeds every funnel stage.
  */
final case class AudioFunnelRow(
    decoded: Boolean, n_samples: Long, lms: Seq[Int])

/** Typed return row of q_multimodal_audiomd's container-metadata
  * kernel (MP3 frame walk / FLAC STREAMINFO fields).
  */
final case class AudioMdRow(
    fmt: String, rate_kbps: Int, sample_rate: Int, channels: Int,
    n_frames: Int, n_samples: Long, duration_ms: Long)

object PipelineQueries extends QueryPack {

  /** Fill `gray` with md5-derived bytes: pixel i takes byte i%16 of
    * md5(key(i/16)) — the ONE synthetic-pixel convention every image
    * query's kernel AND oracle share (`('0x' || substr(md5(key),
    * (i%16)*2+1, 2))::BIGINT` on the DuckDB side).
    */
  private[queries] def md5Fill(gray: Array[Int], key: Int => String): Unit = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var blk = 0
    while (blk * 16 < gray.length) {
      val d = md.digest(key(blk).getBytes("US-ASCII"))
      var off = 0
      while (off < 16 && blk * 16 + off < gray.length) {
        gray(blk * 16 + off) = d(off) & 0xff
        off += 1
      }
      blk += 1
    }
  }

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_hash_ids", Seq("P10", "P11"),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 50 === 0)
          .select(
            col("doc_id"),
            concat(lit("C"), sha2(col("text"), 256)).as("cid"))
          .withColumn("xid",
            concat(lit("X"), substring(col("cid"), 2, 64)))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, 'C' || sha256(text) AS cid,
          'X' || substr('C' || sha256(text), 2, 64) AS xid
        FROM documents WHERE doc_id % 50 = 0 ORDER BY doc_id"""),
      "Content-addressed ids: type prefix + sha hash, prefix surgery " +
        "(C->X) — the reference's compound/reaction identity scheme."),

    GraftQuery(
      "q_stoich_agg", Seq("A2", "A3", "P11"),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") % 499 === 0)
          .groupBy("l_orderkey", "l_partkey")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("l_orderkey")
          .agg(array_join(array_sort(collect_list(
            format_string("(%d) %d", col("cnt"), col("l_partkey")))), " + ")
            .as("equation"))
          .orderBy("l_orderkey"),
      Some("""WITH c AS (SELECT l_orderkey, l_partkey, count(*) AS cnt
            FROM lineitem WHERE l_orderkey % 499 = 0 GROUP BY 1,2),
          e AS (SELECT l_orderkey,
            string_agg('(' || cnt || ') ' || l_partkey, ' + '
              ORDER BY '(' || cnt || ') ' || l_partkey) AS equation
          FROM c GROUP BY 1)
        SELECT l_orderkey, equation FROM e ORDER BY 1"""),
      "Stoichiometry counting + sorted text equation — the reference's " +
        "half-reaction build (reactions.py:87-116, utils.py:343-361)."),

    GraftQuery(
      "q_mass_change", Seq("J12"),
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("items_net"))
        Tables.load(s, dir, "orders")
          .where(col("o_orderkey") % 199 === 0)
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"),
            round(col("o_totalprice") - col("items_net"), 2)
              .as("mass_change"))
          .orderBy("o_orderkey")
      },
      Some("""WITH li AS (SELECT l_orderkey,
            sum(l_extendedprice * (1 - l_discount)) AS items_net
          FROM lineitem GROUP BY 1)
        SELECT o_orderkey, round(o_totalprice - items_net, 2) AS mass_change
        FROM orders JOIN li ON o_orderkey = l_orderkey
        WHERE o_orderkey % 199 = 0 ORDER BY 1"""),
      "Mass-change computation across a join — add_reaction_mass_change " +
        "(databases.py:117-173)."),

    GraftQuery(
      "q_pathlen", Seq("W6", "W7"),
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(array_sort(collect_set("l_partkey")).as("path"))
          .select(col("l_orderkey"), size(col("path")).as("path_len"),
            element_at(
              array(lit(5), lit(10), lit(20)),
              least(size(col("path")), lit(3))).as("gen_threshold"),
            array_join(col("path"), ";").as("path_str"))
          .orderBy(col("path_len").desc, col("l_orderkey").asc)
          .limit(10),
      Some("""SELECT l_orderkey, len(path) AS path_len,
          [5,10,20][least(len(path), 3)] AS gen_threshold,
          array_to_string(path, ';') AS path_str
        FROM (SELECT l_orderkey,
            list_sort(list_distinct(list(l_partkey))) AS path
          FROM lineitem GROUP BY 1)
        ORDER BY len(path) DESC, l_orderkey LIMIT 10"""),
      "Path arrays sorted by length (pathway_search.py:61) + the per-gen " +
        "threshold list lookup crit[min(gen, len-1)] (similarity.py:610)."),

    GraftQuery(
      "q_product_of_native", Seq("J8", "J7"),
      (s, dir) => {
        // the reference's 3-stage $lookup chain (compound -> producing
        // reactions -> reactant compounds vs native set) mapped onto the
        // star schema: part -> orders containing it -> customers, keep
        // parts ordered by at least one "native" (BUILDING) customer
        val li = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
        val natives = Tables.load(s, dir, "customer")
          .where(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val nativeOrders = o
          .join(natives, o("o_custkey") === natives("c_custkey"), "left_semi")
          .select("o_orderkey")
        val candidates = Tables.load(s, dir, "part")
          .where(col("p_partkey") % 40 === 0)
          .select("p_partkey", "p_brand")
        candidates
          .join(li.join(nativeOrders,
              li("l_orderkey") === nativeOrders("o_orderkey"), "left_semi")
              .select("l_partkey").distinct(),
            col("p_partkey") === col("l_partkey"), "left_semi")
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n_native_produced"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n_native_produced
        FROM part
        WHERE p_partkey % 40 = 0 AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_partkey = p_partkey AND EXISTS (
            SELECT 1 FROM orders
            WHERE o_orderkey = l_orderkey AND EXISTS (
              SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')))
        GROUP BY 1 ORDER BY 1"""),
      "check_product_of_native (metabolomics.py:273-352): the 3-stage " +
        "lookup chain as cascaded semi-joins — no row explosion."),

    GraftQuery(
      "q_path_enum", Seq("W6", "D4", "A13"),
      (s, dir) => {
        // Pathway ENUMERATION at bench scale (pathway_search.py's dfs
        // loop over a source list): a synthetic reaction network from
        // the co-purchase data — each selected order is a reaction
        // consuming its min part and producing the rest — walked by
        // the REAL PathwaySearch.enumerate closure loop: per-round
        // frontier ⋈ reactants ⋈ products equi-joins, checkpointed
        // lineage, cycle-free path arrays, an NP-proxy traversal gate
        // (the script's NP-floor/ΔG-cap predicate shape), depth cap 4.
        // At sf0.1 the frontier grows 3.4k -> 44k rows per round, so
        // the loop's join discipline is measured, not assumed; the
        // frontier is never collected. The oracle replays the whole
        // traversal as a depth-bounded recursive CTE with string
        // paths; the per-depth path-set fingerprint (hash64 of the
        // '>'-joined reaction sequence) pins path CONTENT, not just
        // counts.
        import graft.operators.TextOps
        import graft.pickaxe.{NetworkState, PathwaySearch}
        val li = Tables.load(s, dir, "lineitem")
          .where(col("l_orderkey") % 3 === 0)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val rx = li.groupBy("ok").agg(min("pk").as("src"))
        val edges = rx.join(li, Seq("ok"))
          .where(col("pk") =!= col("src"))
        val reactions = edges.groupBy("ok", "src")
          .agg(collect_list(struct(lit(1).as("stoich"),
            concat(lit("C"), col("pk")).as("c_id"))).as("Products"))
          .select(concat(lit("R"), col("ok")).as("_id"),
            array(struct(lit(1).as("stoich"),
              concat(lit("C"), col("src")).as("c_id"))).as("Reactants"),
            col("Products"))
        val compounds = Tables.load(s, dir, "part")
          .select(concat(lit("C"), col("p_partkey")).as("_id"),
            expr("cast(round(p_retailprice * 100) as long) % 97")
              .as("np"))
        val seeds = Tables.load(s, dir, "part")
          .where(col("p_partkey") % 37 === 0)
          .select(concat(lit("C"), col("p_partkey")).as("_id"))
        PathwaySearch.enumerate(
            NetworkState(compounds, reactions, 0), seeds,
            maxLength = 4, compoundGate = Some(col("np") >= 20))
          .withColumn("pstr",
            concat(lit(">"), concat_ws(">", col("path"))))
          .groupBy("n_steps")
          .agg(count(lit(1)).as("n_paths"),
            countDistinct("end_id").as("n_ends"),
            sum(expr(TextOps.hash64("pstr") + " % 1000000007"))
              .as("paths_fp"))
          .orderBy("n_steps")
      },
      Some("""WITH RECURSIVE
        li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_orderkey % 3 = 0),
        rx AS (SELECT ok, min(pk) AS src FROM li GROUP BY ok),
        edges AS (SELECT r.ok AS rxn, r.src, l.pk AS dst
          FROM rx r JOIN li l ON l.ok = r.ok AND l.pk != r.src),
        gate AS (SELECT p_partkey AS pk FROM part
          WHERE (round(p_retailprice * 100)::BIGINT % 97) >= 20),
        seeds AS (SELECT p_partkey AS v FROM part
          WHERE p_partkey % 37 = 0),
        walks(v, path, seen, k) AS (
          SELECT v, '', ',' || v::VARCHAR || ',', 0 FROM seeds
          UNION ALL
          SELECT e.dst, w.path || '>R' || e.rxn::VARCHAR,
            w.seen || e.dst::VARCHAR || ',', w.k + 1
          FROM walks w JOIN edges e ON e.src = w.v
          JOIN gate g ON g.pk = e.dst
          WHERE w.k < 4
            AND NOT contains(w.seen, ',' || e.dst::VARCHAR || ','))
        SELECT k AS n_steps, count(*)::BIGINT AS n_paths,
          count(DISTINCT v)::BIGINT AS n_ends,
          sum(('0x' || substr(md5(path), 1, 15))::BIGINT
            % 1000000007)::BIGINT AS paths_fp
        FROM walks WHERE k >= 1 GROUP BY 1 ORDER BY 1"""),
      "Bench-scale pathway enumeration: the level-synchronous closure " +
        "loop (frontier joins with checkpointed lineage, no driver " +
        "frontier) over a 40k-reaction synthetic network with an " +
        "NP-proxy traversal gate; per-depth counts plus a path-content " +
        "fingerprint, oracle-replayed as a recursive CTE."),

    GraftQuery(
      "q_multimodal", Seq("S10", "D9", "P6"),
      (s, dir) => {
        val media = Tables.load(s, dir, "documents")
          .withColumn("media", col("text").cast("binary"))
          .withColumn("n_bytes", octet_length(col("media")))
          .withColumn("n_chunks",
            ceil(col("n_bytes") / 256.0).cast("long"))
          .withColumn("header_sig", md5(substring(col("text"), 1, 4)))
        media.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_bytes").as("total_bytes"),
            sum("n_chunks").as("total_chunks"),
            countDistinct("header_sig").as("n_headers"))
          .orderBy("source")
      },
      Some("""WITH m AS (SELECT source, strlen(text) AS n_bytes,
            ceil(strlen(text) / 256.0)::BIGINT AS n_chunks,
            md5(substr(text, 1, 4)) AS header_sig
          FROM documents)
        SELECT source, count(*) AS n_docs,
          sum(n_bytes)::BIGINT AS total_bytes,
          sum(n_chunks)::BIGINT AS total_chunks,
          count(DISTINCT header_sig) AS n_headers
        FROM m GROUP BY 1 ORDER BY 1"""),
      "Multimodal binary-column pipeline: opaque bytes + chunk budget + " +
        "deterministic header 'decode' stub (see operators.Multimodal " +
        "for the mapPartitions feature-extraction plumbing)."),

    GraftQuery(
      "q_multimodal_frames", Seq("D9", "P6", "A8"),
      (s, dir) => {
        // Frame sampling — the video-pipeline SELECTION step (every
        // 4th 64-unit frame; decode happens downstream): one row per
        // sampled frame via sequence + explode + substring, all
        // codegen'd. This oracle query frames on CHARACTER offsets
        // (both engines' substring is char-based; DuckDB has no blob
        // substring, so byte-exact framing is not oracle-expressible —
        // the true byte-based kernel is Multimodal.frameSample,
        // MultimodalSpec-pinned). Per-source stats close the loop
        // with an order-independent md5-derived fingerprint of every
        // sampled frame, proving frame CONTENT (boundaries included)
        // matches across engines, not just counts.
        import graft.operators.TextOps
        val frames = Tables.load(s, dir, "documents")
          .withColumn("nf",
            ceil(length(col("text")) / 64.0).cast("int"))
          .where(col("nf") > 0)
          .withColumn("fi", explode(expr("sequence(0, nf - 1, 4)")))
          .withColumn("frame", expr("substring(text, fi * 64 + 1, 64)"))
        frames.groupBy("source")
          .agg(countDistinct("doc_id").as("n_docs"),
            count(lit(1)).as("n_frames"),
            countDistinct(md5(col("frame"))).as("n_distinct_frames"),
            sum(expr(TextOps.hash64("frame") + " % 1000000007"))
              .as("frames_fp"))
          .orderBy("source")
      },
      Some("""WITH m AS (SELECT doc_id, source,
            ceil(length(text) / 64.0)::INT AS nf, text FROM documents),
          f AS (SELECT doc_id, source,
              substr(text, i::INT * 64 + 1, 64) AS frame
            FROM (SELECT doc_id, source, text,
                unnest(range(0, nf, 4)) AS i
              FROM m WHERE nf > 0))
        SELECT source, count(DISTINCT doc_id) AS n_docs,
          count(*)::BIGINT AS n_frames,
          count(DISTINCT md5(frame)) AS n_distinct_frames,
          sum(('0x' || substr(md5(frame),1,15))::BIGINT % 1000000007)
            ::BIGINT AS frames_fp
        FROM f GROUP BY 1 ORDER BY 1"""),
      "Multimodal frame sampling (every 4th 64-unit frame, tail frame " +
        "included): codegen'd sequence/explode/substring selection, " +
        "per-source frame counts plus an order-independent content " +
        "fingerprint over every sampled frame."),

    GraftQuery(
      "q_multimodal_resize", Seq("P6", "A8", "D9"),
      (s, dir) => {
        // RESIZE planning — the geometry stage of an image pipeline
        // (Multimodal.withResizePlan): fit each image's dimensions
        // into a 256-px box with integer-exact aspect-ratio math,
        // never upscaling, and budget the output pixels. Dimensions
        // come from the q_multimodal stub convention (the first 4
        // bytes pretend to encode WxH — decodeFeatures' fallback branch)
        // so the oracle can replay the whole plan relationally; with
        // real headers the SAME withResizePlan runs on the
        // ImageHeader-parsed columns (MultimodalSpec pins that path).
        val dims = Tables.load(s, dir, "documents")
          .where(length(col("text")) >= 4)
          .withColumn("width", lit(1) +
            (ascii(substring(col("text"), 1, 1)) * 256 +
              ascii(substring(col("text"), 2, 1))) % 1024)
          .withColumn("height", lit(1) +
            (ascii(substring(col("text"), 3, 1)) * 256 +
              ascii(substring(col("text"), 4, 1))) % 1024)
        graft.operators.Multimodal
          .withResizePlan(dims, "width", "height", maxDim = 256)
          .groupBy("source")
          .agg(count(lit(1)).as("n_imgs"),
            sum(when(col("resized"), 1L).otherwise(0L)).as("n_resized"),
            sum("target_w").as("sum_w"),
            sum("target_h").as("sum_h"),
            sum("out_pixels").as("out_pixels"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source,
            1 + (ord(substr(text, 1, 1)) * 256
               + ord(substr(text, 2, 1))) % 1024 AS w,
            1 + (ord(substr(text, 3, 1)) * 256
               + ord(substr(text, 4, 1))) % 1024 AS h
          FROM documents WHERE length(text) >= 4),
          p AS (SELECT source,
            greatest(w, h) > 256 AS resized,
            CASE WHEN greatest(w, h) <= 256 THEN w
                 WHEN w >= h THEN 256
                 ELSE greatest((w * 256) // h, 1) END AS tw,
            CASE WHEN greatest(w, h) <= 256 THEN h
                 WHEN w >= h THEN greatest((h * 256) // w, 1)
                 ELSE 256 END AS th
          FROM d)
        SELECT source, count(*)::BIGINT AS n_imgs,
          sum(CASE WHEN resized THEN 1 ELSE 0 END)::BIGINT AS n_resized,
          sum(tw)::BIGINT AS sum_w, sum(th)::BIGINT AS sum_h,
          sum(tw::BIGINT * th)::BIGINT AS out_pixels
        FROM p GROUP BY 1 ORDER BY 1"""),
      "Aspect-fit resize planning over the multimodal column: " +
        "integer-exact target geometry (floor division, 1-px floor, " +
        "never upscale), per-source work flags and output-pixel " +
        "budgets — the decisions a distributed image-resize stage " +
        "schedules on, with the pixel resample left to the codec UDF."),

    GraftQuery(
      "q_multimodal_resize_real", Seq("P6", "A8", "D9"),
      (s, dir) => {
        // The resize PLAN on REAL container bytes: per doc, a real
        // PNG with doc-derived dimensions (w = 16 + id%200, h = 16 +
        // 7id%200, constant fill id%256 — cheap to deflate, and
        // px_sum = w*h*fill is oracle-exact), pushed through the
        // production decode column (featuresColumn: signature sniff,
        // IHDR parse, pixel decode) and then the aspect-fit planner
        // on the DECODED dimensions. The oracle recomputes dims,
        // gray mass, and the whole plan from the id arithmetic — so
        // equality pins encode -> header/pixel decode -> plan
        // composition, not just the plan math.
        import graft.operators.{Multimodal, PixelDecode}
        val mkPng = udf((docId: Long) => {
          val w = (16 + docId % 200).toInt
          val h = (16 + docId * 7 % 200).toInt
          PixelDecode.encodePngGray(w, h,
            Array.fill(w * h)((docId % 256).toInt))
        })
        val media = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("source"))
          .withColumn("media", mkPng(col("doc_id")))
          .withColumn("mf", Multimodal.featuresColumn(col("media")))
          .select(col("doc_id"), col("source"),
            col("mf.width").as("width"), col("mf.height").as("height"),
            col("mf.decoded"), col("mf.px_sum"))
        Multimodal.withResizePlan(media, "width", "height", maxDim = 64)
          .groupBy("source")
          .agg(count(lit(1)).as("n_imgs"),
            sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
            sum("width").as("sum_w"), sum("height").as("sum_h"),
            sum(when(col("resized"), 1L).otherwise(0L)).as("n_resized"),
            sum("target_w").as("sum_tw"), sum("target_h").as("sum_th"),
            sum("out_pixels").as("out_pixels"),
            sum(col("px_sum") % 1000000007L).as("px_fp"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (16 + doc_id % 200)::BIGINT AS w,
            (16 + (doc_id * 7) % 200)::BIGINT AS h,
            (doc_id % 256)::BIGINT AS fill
          FROM documents WHERE doc_id % 2 = 0),
        p AS (SELECT source, w, h, w * h * fill AS px_sum,
            greatest(w, h) > 64 AS resized,
            CASE WHEN greatest(w, h) <= 64 THEN w
                 WHEN w >= h THEN 64
                 ELSE greatest((w * 64) // h, 1) END AS tw,
            CASE WHEN greatest(w, h) <= 64 THEN h
                 WHEN w >= h THEN greatest((h * 64) // w, 1)
                 ELSE 64 END AS th
          FROM d)
        SELECT source, count(*)::BIGINT AS n_imgs,
          count(*)::BIGINT AS n_decoded,
          sum(w)::BIGINT AS sum_w, sum(h)::BIGINT AS sum_h,
          sum(CASE WHEN resized THEN 1 ELSE 0 END)::BIGINT AS n_resized,
          sum(tw)::BIGINT AS sum_tw, sum(th)::BIGINT AS sum_th,
          sum(tw * th)::BIGINT AS out_pixels,
          sum(px_sum % 1000000007)::BIGINT AS px_fp
        FROM p GROUP BY 1 ORDER BY 1"""),
      "Aspect-fit resize planning on REAL decoded dimensions: " +
        "doc-derived PNGs through the production decode column, the " +
        "planner on what the decoder reports — oracle recomputes " +
        "dims, gray mass, and the plan from the id arithmetic, " +
        "pinning the encode -> decode -> plan composition."),

    GraftQuery(
      "q_multimodal_exif", Seq("P6", "A8", "D9"),
      (s, dir) => {
        // EXIF-aware thumbnail planning on REAL JPEG header bytes:
        // per doc, a synthetic JPEG (SOI + APP1 "Exif" TIFF with
        // orientation 1 + id%8 + SOF0 with id-derived dims + EOI) is
        // byte-built in the kernel, then the PRODUCTION parsers run —
        // ImageHeader.parse for the SOFn dimensions,
        // exifOrientation for tag 274 — and withDisplayDims +
        // withResizePlan compute the rotation-corrected plan. The
        // oracle replays everything from the id arithmetic, so
        // equality pins the marker walk, the IFD walk, the
        // orientation swap, and the plan composition. (Orientations
        // 5-8 swap: planning on RAW dims here would flip target
        // geometry for half the corpus — the classic thumbnail bug.)
        import graft.operators.{ImageHeader, Multimodal}
        val kernel = udf((docId: Long) => {
          val w = (100 + docId % 1500).toInt
          val h = (100 + docId * 3 % 1500).toInt
          val orient = (1 + docId % 8).toInt
          def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
          val tiff = b('I', 'I', 42, 0, 8, 0, 0, 0, // IFD at 8
            1, 0, // one entry
            18, 1, 3, 0, 1, 0, 0, 0, // tag 274, SHORT, count 1
            orient, 0, 0, 0) ++ b(0, 0, 0, 0)
          val app1 = "Exif".getBytes("US-ASCII") ++ b(0, 0) ++ tiff
          val sof = b(0xff, 0xc0, 0, 11, 8,
            h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 0x11, 0)
          val jpeg = b(0xff, 0xd8, 0xff, 0xe1,
            (app1.length + 2) >> 8, (app1.length + 2) & 0xff) ++
            app1 ++ sof ++ b(0xff, 0xd9)
          val info = ImageHeader.parse(jpeg).get
          val o = ImageHeader.exifOrientation(jpeg).get
          (info.format, info.width, info.height, o)
        })
        val parsed = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("p", kernel(col("doc_id")))
          .select(col("source"), col("p._1").as("fmt"),
            col("p._2").as("w"), col("p._3").as("h"),
            col("p._4").as("orient"))
        Multimodal.withResizePlan(
            Multimodal.withDisplayDims(parsed, "w", "h", "orient"),
            "disp_w", "disp_h", maxDim = 256)
          .groupBy("source")
          .agg(count(lit(1)).as("n_imgs"),
            sum(when(col("fmt") === "jpeg", 1L).otherwise(0L))
              .as("n_jpeg"),
            sum(when(col("orient").isin(5, 6, 7, 8), 1L).otherwise(0L))
              .as("n_rotated"),
            sum("disp_w").as("sum_dw"), sum("disp_h").as("sum_dh"),
            sum(when(col("resized"), 1L).otherwise(0L)).as("n_resized"),
            sum("target_w").as("sum_tw"), sum("target_h").as("sum_th"),
            sum("out_pixels").as("out_pixels"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (100 + doc_id % 1500)::BIGINT AS w,
            (100 + (doc_id * 3) % 1500)::BIGINT AS h,
            (1 + doc_id % 8)::BIGINT AS o
          FROM documents),
        disp AS (SELECT source, o,
            CASE WHEN o >= 5 THEN h ELSE w END AS dw,
            CASE WHEN o >= 5 THEN w ELSE h END AS dh
          FROM d),
        p AS (SELECT source, o, dw, dh,
            greatest(dw, dh) > 256 AS resized,
            CASE WHEN greatest(dw, dh) <= 256 THEN dw
                 WHEN dw >= dh THEN 256
                 ELSE greatest((dw * 256) // dh, 1) END AS tw,
            CASE WHEN greatest(dw, dh) <= 256 THEN dh
                 WHEN dw >= dh THEN greatest((dh * 256) // dw, 1)
                 ELSE 256 END AS th
          FROM disp)
        SELECT source, count(*)::BIGINT AS n_imgs,
          count(*)::BIGINT AS n_jpeg,
          sum(CASE WHEN o >= 5 THEN 1 ELSE 0 END)::BIGINT AS n_rotated,
          sum(dw)::BIGINT AS sum_dw, sum(dh)::BIGINT AS sum_dh,
          sum(CASE WHEN resized THEN 1 ELSE 0 END)::BIGINT AS n_resized,
          sum(tw)::BIGINT AS sum_tw, sum(th)::BIGINT AS sum_th,
          sum(tw * th)::BIGINT AS out_pixels
        FROM p GROUP BY 1 ORDER BY 1"""),
      "EXIF-aware thumbnail planning: byte-built JPEGs (APP1 Exif IFD " +
        "+ SOF0) through the production marker/IFD walks, the " +
        "rotation-family width/height swap, and the aspect-fit plan — " +
        "oracle replays from the id arithmetic, pinning the metadata " +
        "path that flips target geometry for half the corpus."),

    GraftQuery(
      "q_multimodal_audio", Seq("S10", "D9", "P6"),
      (s, dir) => {
        // Audio-pipeline roundtrip PROOF: each doc's tokens become a
        // deterministic int16 sample stream (hash-derived), Spark
        // ENCODES it into real RIFF/WAVE bytes
        // (AudioHeader.synthesizeWavPcm16), re-PARSES the container,
        // and computes exact integer PCM stats from the blob — while
        // the oracle computes the identical stats from first
        // principles on the same sample definition. Equality proves
        // the whole binary encode → header walk → PCM decode path,
        // not just the arithmetic. The per-doc UDF is the
        // codec-shaped step (a real encoder would drop in here);
        // everything around it — sample derivation, per-doc grouping,
        // final aggregation — is codegen'd columnar.
        //
        // Scale shape: samples are per-doc and bounded by token
        // count; the only shuffle is the per-doc regroup (doc-keyed),
        // and blobs live one row at a time inside the UDF — never
        // collected, never broadcast.
        import graft.operators.{AudioHeader, TextOps}
        val decode = udf((samples: Seq[Int]) => {
          val wav = AudioHeader.synthesizeWavPcm16(
            8000, samples.map(_.toShort).toArray)
          val info = AudioHeader.parse(wav).get
          val st = AudioHeader.pcm16Stats(wav).get
          val rms = if (st.n == 0) 0L
            else math.round(math.sqrt(st.sumSq.toDouble / st.n) * 1000)
          WavStats(info.nSamples, info.durationMs, st.peak, rms,
            st.nClipped)
        })
        // samples derive IN-ROW via transform's index lambda — no
        // posexplode + regroup shuffle; the whole query is
        // shuffle-free up to the final sort (round-15 plan cleanup)
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 0)
          .withColumn("ts", TextOps.tokens("text"))
          .where(size(col("ts")) > 0) // explode used to drop these
          .withColumn("sm", expr(
            "transform(ts, (w, i) -> cast(" +
              TextOps.hash64("concat(doc_id, ':', i, ':', w)") +
              " % 65536 - 32768 as int))"))
          .withColumn("st", decode(col("sm")))
          .select(col("doc_id"), col("st.n_samples"),
            col("st.duration_ms"), col("st.peak"), col("st.rms_x1000"),
            col("st.n_clipped"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id,
            list_filter(string_split(text, ' '), x -> x != '') AS t
          FROM documents WHERE doc_id % 5 = 0),
        sm AS (SELECT doc_id,
            (('0x' || substr(md5(doc_id::VARCHAR || ':' ||
              (i - 1)::VARCHAR || ':' || t[i]),1,15))::BIGINT
              % 65536 - 32768)::INT AS sv
          FROM (SELECT doc_id, t,
              unnest(range(1, len(t) + 1)) AS i FROM d)),
        st AS (SELECT doc_id, count(*)::BIGINT AS n,
            max(abs(sv))::INT AS peak,
            sum(sv::BIGINT * sv)::BIGINT AS ssq,
            sum(CASE WHEN sv = 32767 OR sv = -32768 THEN 1 ELSE 0
              END)::BIGINT AS n_clipped
          FROM sm GROUP BY 1)
        SELECT doc_id, n AS n_samples,
          (n * 1000 // 8000)::BIGINT AS duration_ms, peak,
          round(sqrt(ssq::DOUBLE / n) * 1000)::BIGINT AS rms_x1000,
          n_clipped
        FROM st ORDER BY doc_id"""),
      "Audio roundtrip: token-derived int16 streams encoded into real " +
        "RIFF/WAVE blobs, container re-parsed, exact integer PCM " +
        "stats — oracle recomputes from first principles, so equality " +
        "proves the binary encode/parse/decode path itself."),

    GraftQuery(
      "q_multimodal_audiohash", Seq("P6", "D9", "J11"),
      (s, dir) => {
        // Audio FINGERPRINTING through the real codec path: the same
        // token-derived PCM16 clips as q_multimodal_audio, WAV-encoded
        // and re-decoded, then hashed with the delta-coded envelope
        // hash (AudioHeader.envelopeHash — the audio dHash: 65 exact
        // Σ|sample| windows, bit w = env(w) > env(w+1)). The oracle
        // replays the window partition (floor(pos*65/n)) and the
        // comparison bits relationally, halves-split for signed
        // BIGINT; equality proves the encode -> chunk walk -> PCM
        // read -> envelope math end to end.
        import graft.operators.{AudioHeader, TextOps}
        val kernel = udf((samples: Seq[Int]) => {
          val wav = AudioHeader.synthesizeWavPcm16(
            8000, samples.map(_.toShort).toArray)
          val bits = AudioHeader.envelopeHash(wav).get
          DhashStats(bits & 0xffffffffL, bits >>> 32)
        })
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 0)
          .withColumn("ts", TextOps.tokens("text"))
          .where(size(col("ts")) > 0)
          .withColumn("sm", expr(
            "transform(ts, (w, i) -> cast(" +
              TextOps.hash64("concat(doc_id, ':', i, ':', w)") +
              " % 65536 - 32768 as int))"))
          .withColumn("st", kernel(col("sm")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_clips"),
            sum(col("st.dlo") % 1000000007L).as("dlo_fp"),
            sum(col("st.dhi") % 1000000007L).as("dhi_fp"),
            countDistinct(concat(col("st.dlo"), lit(":"),
              col("st.dhi"))).as("n_hashes"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            list_filter(string_split(text, ' '), x -> x != '') AS t
          FROM documents WHERE doc_id % 5 = 0),
        sm AS (SELECT doc_id, source, i - 1 AS pos,
            (('0x' || substr(md5(doc_id::VARCHAR || ':' ||
              (i - 1)::VARCHAR || ':' || t[i]), 1, 15))::BIGINT
              % 65536 - 32768)::BIGINT AS sv,
            len(t) AS n
          FROM (SELECT doc_id, source, t,
              unnest(range(1, len(t) + 1)) AS i
            FROM d WHERE len(t) > 0)),
        env0 AS (SELECT doc_id, source, (pos * 65) // n AS w,
            sum(abs(sv))::BIGINT AS e
          FROM sm GROUP BY 1, 2, 3),
        keys AS (SELECT DISTINCT doc_id, source FROM env0),
        grid AS (SELECT k.doc_id, k.source, w.w
          FROM keys k, (SELECT unnest(range(65)) AS w) w),
        env AS (SELECT g.doc_id, g.source, g.w,
            coalesce(e.e, 0)::BIGINT AS e
          FROM grid g LEFT JOIN env0 e
            ON e.doc_id = g.doc_id AND e.w = g.w),
        dh AS (SELECT a.doc_id, a.source,
            sum(CASE WHEN a.e > b.e AND a.w < 32
              THEN (1::BIGINT << a.w) ELSE 0 END)::BIGINT AS dlo,
            sum(CASE WHEN a.e > b.e AND a.w >= 32 AND a.w < 64
              THEN (1::BIGINT << (a.w - 32)) ELSE 0 END)::BIGINT AS dhi
          FROM env a JOIN env b
            ON a.doc_id = b.doc_id AND b.w = a.w + 1
          GROUP BY 1, 2)
        SELECT source, count(*)::BIGINT AS n_clips,
          sum(dlo % 1000000007)::BIGINT AS dlo_fp,
          sum(dhi % 1000000007)::BIGINT AS dhi_fp,
          count(DISTINCT dlo::VARCHAR || ':' || dhi::VARCHAR)
            AS n_hashes
        FROM dh GROUP BY 1 ORDER BY 1"""),
      "Audio envelope fingerprint through the real WAV codec path: " +
        "the delta-coded loudness-profile hash (the audio dHash) " +
        "computed from re-decoded PCM bytes, oracle-replayed from the " +
        "sample definition — the cheap audio near-dup primitive."),

    GraftQuery(
      "q_multimodal_phash", Seq("P6", "D9", "A8"),
      (s, dir) => {
        // Image-pipeline roundtrip PROOF, the visual twin of
        // q_multimodal_audio: each doc becomes a deterministic 32x32
        // grayscale image (md5-derived pixels), Spark ENCODES it into
        // real PNG bytes (PixelDecode.encodePngGray — Deflater,
        // filters, CRC), DECODES the pixels back (ImageIO / pure-PNG
        // engine), and computes the integer-DCT perceptual hash plus
        // exact gray stats from the DECODED image — while the oracle
        // computes the identical features from first principles on
        // the same pixel definition (the shared DctCos constant table
        // is inlined as a VALUES relation, so no cross-engine libm
        // question exists). Equality proves the whole PNG encode ->
        // inflate -> unfilter -> luma -> DCT -> median-threshold path.
        //
        // Scale shape: one image per row inside the UDF (the
        // codec-shaped step), per-source aggregation is codegen'd;
        // nothing collects, nothing broadcasts.
        import graft.operators.PixelDecode
        val kernel = udf((docId: Long) => {
          val gray = new Array[Int](1024)
          md5Fill(gray, blk => s"$docId:$blk")
          val png = PixelDecode.encodePngGray(32, 32, gray)
          val px = PixelDecode.decode(png).get
          val g = PixelDecode.grayLuma(px)
          var su = 0L; var sq = 0L; var i = 0
          while (i < g.length) {
            su += g(i); sq += g(i).toLong * g(i); i += 1
          }
          PhashStats(PixelDecode.pHash(g, px.width, px.height), su, sq)
        })
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("st", kernel(col("doc_id")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_imgs"),
            sum(col("st.phash") % 1000000007L).as("phash_fp"),
            countDistinct(col("st.phash")).as("n_phash"),
            sum("st.px_sum").as("px_sum"),
            sum("st.px_sumsq").as("px_sumsq"))
          .orderBy("source")
      },
      Some {
        val ctvals = (for (u <- 0 until 8; x <- 0 until 32)
          yield s"($u,$x,${graft.operators.PixelDecode.DctCos(u)(x)})")
          .mkString(",")
        s"""WITH ct(u, x, cv) AS (SELECT * FROM (VALUES $ctvals) v(u, x, cv)),
        px AS (
          SELECT doc_id, source, (i // 32) AS r, (i % 32) AS c,
            ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
              (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT AS g
          FROM documents, (SELECT unnest(range(1024)) AS i)),
        t1 AS (
          SELECT px.doc_id, px.source, ct.u AS u, px.c AS y,
            sum(px.g * ct.cv)::BIGINT AS t
          FROM px JOIN ct ON ct.x = px.r GROUP BY 1, 2, 3, 4),
        co AS (
          SELECT t1.doc_id, t1.source, t1.u AS u, ct.u AS v,
            sum(t1.t * ct.cv)::BIGINT AS coef
          FROM t1 JOIN ct ON ct.x = t1.y GROUP BY 1, 2, 3, 4),
        acs AS (
          SELECT doc_id, source, u, v, coef,
            row_number() OVER (PARTITION BY doc_id ORDER BY coef) AS rn
          FROM co WHERE NOT (u = 0 AND v = 0)),
        med AS (SELECT doc_id, coef AS med FROM acs WHERE rn = 32),
        ph AS (
          SELECT a.doc_id, a.source,
            sum(CASE WHEN a.coef > m.med
              THEN (1::BIGINT << (a.u * 8 + a.v - 1))
              ELSE 0 END)::BIGINT AS phash
          FROM acs a JOIN med m USING (doc_id) GROUP BY 1, 2),
        gs AS (SELECT doc_id, sum(g)::BIGINT AS su,
            sum(g * g)::BIGINT AS sq
          FROM px GROUP BY 1)
        SELECT ph.source, count(*)::BIGINT AS n_imgs,
          sum(ph.phash % 1000000007)::BIGINT AS phash_fp,
          count(DISTINCT ph.phash) AS n_phash,
          sum(gs.su)::BIGINT AS px_sum, sum(gs.sq)::BIGINT AS px_sumsq
        FROM ph JOIN gs USING (doc_id) GROUP BY 1 ORDER BY 1"""
      },
      "Image roundtrip: md5-derived 32x32 grayscale images encoded " +
        "into real PNG blobs, pixels decoded back, integer-DCT pHash " +
        "+ exact gray stats — the oracle replays the identical " +
        "feature math (shared integer cosine table) from first " +
        "principles, so equality proves the PNG codec path itself."),

    GraftQuery(
      "q_multimodal_dhash", Seq("P6", "D9", "A8"),
      (s, dir) => {
        // The dHash leg of the image roundtrip: 9x8 images (dHash's
        // native geometry, so the area resample is the pinned
        // identity) through the same PNG encode -> decode path; the
        // 64 comparison bits ship as two 32-bit halves so the
        // oracle's bit sums stay inside signed BIGINT.
        import graft.operators.PixelDecode
        val kernel = udf((docId: Long) => {
          val gray = new Array[Int](72)
          md5Fill(gray, blk => s"$docId:$blk")
          val png = PixelDecode.encodePngGray(9, 8, gray)
          val px = PixelDecode.decode(png).get
          val g = PixelDecode.grayLuma(px)
          val bits = PixelDecode.dHash(g, px.width, px.height)
          DhashStats(bits & 0xffffffffL, bits >>> 32)
        })
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("st", kernel(col("doc_id")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_imgs"),
            sum(col("st.dlo") % 1000000007L).as("dlo_fp"),
            sum(col("st.dhi") % 1000000007L).as("dhi_fp"),
            countDistinct(concat(col("st.dlo"), lit(":"),
              col("st.dhi"))).as("n_dhash"))
          .orderBy("source")
      },
      Some("""WITH px AS (
          SELECT doc_id, source, (i // 9) AS r, (i % 9) AS c,
            ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
              (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT AS g
          FROM documents, (SELECT unnest(range(72)) AS i)),
        cmp AS (
          SELECT a.doc_id, a.source, a.r * 8 + a.c AS bit,
            a.g > b.g AS setb
          FROM px a JOIN px b
            ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
          WHERE a.c < 8),
        dh AS (
          SELECT doc_id, source,
            sum(CASE WHEN setb AND bit < 32 THEN (1::BIGINT << bit)
              ELSE 0 END)::BIGINT AS dlo,
            sum(CASE WHEN setb AND bit >= 32
              THEN (1::BIGINT << (bit - 32)) ELSE 0 END)::BIGINT AS dhi
          FROM cmp GROUP BY 1, 2)
        SELECT source, count(*)::BIGINT AS n_imgs,
          sum(dlo % 1000000007)::BIGINT AS dlo_fp,
          sum(dhi % 1000000007)::BIGINT AS dhi_fp,
          count(DISTINCT dlo::VARCHAR || ':' || dhi::VARCHAR) AS n_dhash
        FROM dh GROUP BY 1 ORDER BY 1"""),
      "Difference-hash roundtrip at dHash's native 9x8 geometry: " +
        "PNG-encoded md5-derived images decoded back to pixels, the " +
        "64 neighbor comparisons recomputed relationally by the " +
        "oracle — proving decode + dHash bit math end to end."),

    GraftQuery(
      "q_multimodal_features", Seq("P6", "D9", "S10"),
      (s, dir) => {
        // The REAL feature-extraction operator under the oracle gate:
        // Multimodal.withDecodedFeatures (the featuresColumn decode
        // plumbing itself, not a query-local kernel) runs over
        // actual PNG bytes synthesized per doc, and the oracle
        // recomputes every emitted feature from the pixel definition
        // — including the 32x32 -> 9x8 exact area RESAMPLE inside
        // dHash, replayed relationally with the same scaled-integer
        // box overlaps. Byte-size columns (n_bytes/n_chunks) are
        // Deflater-output-dependent and stay out of the oracle
        // surface; everything pixel-derived is pinned.
        import graft.operators.{Multimodal, PixelDecode}
        val mkPng = udf((docId: Long) => {
          val gray = new Array[Int](1024)
          md5Fill(gray, blk => s"$docId:$blk")
          PixelDecode.encodePngGray(32, 32, gray)
        })
        val media = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("source"))
          .withColumn("media", mkPng(col("doc_id")))
        Multimodal.withDecodedFeatures(media, "media")
          .groupBy("source")
          .agg(count(lit(1)).as("n_imgs"),
            sum(when(col("decoded") && col("format") === "png" &&
              col("width") === 32 && col("height") === 32, 1L)
              .otherwise(0L)).as("n_decoded"),
            sum("px_sum").as("px_sum"),
            sum("px_sumsq").as("px_sumsq"),
            sum(col("phash") % 1000000007L).as("phash_fp"),
            sum(expr("(dhash & 4294967295) % 1000000007"))
              .as("dlo_fp"),
            sum(expr("shiftrightunsigned(dhash, 32) % 1000000007"))
              .as("dhi_fp"))
          .orderBy("source")
      },
      Some {
        val ctvals = (for (u <- 0 until 8; x <- 0 until 32)
          yield s"($u,$x,${graft.operators.PixelDecode.DctCos(u)(x)})")
          .mkString(",")
        s"""WITH ct(u, x, cv) AS (SELECT * FROM (VALUES $ctvals) v(u, x, cv)),
        px AS (
          SELECT doc_id, source, (i // 32) AS r, (i % 32) AS c,
            ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
              (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT AS g
          FROM documents, (SELECT unnest(range(1024)) AS i)
          WHERE doc_id % 3 = 0),
        t1 AS (SELECT px.doc_id, px.source, ct.u AS u, px.c AS y,
            sum(px.g * ct.cv)::BIGINT AS t
          FROM px JOIN ct ON ct.x = px.r GROUP BY 1, 2, 3, 4),
        co AS (SELECT t1.doc_id, t1.source, t1.u AS u, ct.u AS v,
            sum(t1.t * ct.cv)::BIGINT AS coef
          FROM t1 JOIN ct ON ct.x = t1.y GROUP BY 1, 2, 3, 4),
        acs AS (SELECT doc_id, source, u, v, coef,
            row_number() OVER (PARTITION BY doc_id ORDER BY coef) AS rn
          FROM co WHERE NOT (u = 0 AND v = 0)),
        med AS (SELECT doc_id, coef AS med FROM acs WHERE rn = 32),
        ph AS (SELECT a.doc_id, a.source,
            sum(CASE WHEN a.coef > m.med
              THEN (1::BIGINT << (a.u * 8 + a.v - 1))
              ELSE 0 END)::BIGINT AS phash
          FROM acs a JOIN med m USING (doc_id) GROUP BY 1, 2),
        g9 AS (
          SELECT px.doc_id, jj.j, ii.i,
            (sum((least((px.c + 1) * 9, ii.i * 32 + 32)
                - greatest(px.c * 9, ii.i * 32))
              * (least((px.r + 1) * 8, jj.j * 32 + 32)
                - greatest(px.r * 8, jj.j * 32))
              * px.g) // 1024)::BIGINT AS g
          FROM px
          JOIN (SELECT unnest(range(8)) AS j) jj
            ON (px.r + 1) * 8 > jj.j * 32 AND px.r * 8 < jj.j * 32 + 32
          JOIN (SELECT unnest(range(9)) AS i) ii
            ON (px.c + 1) * 9 > ii.i * 32 AND px.c * 9 < ii.i * 32 + 32
          GROUP BY 1, 2, 3),
        dh AS (
          SELECT a.doc_id,
            sum(CASE WHEN a.g > b.g AND a.j * 8 + a.i < 32
              THEN (1::BIGINT << (a.j * 8 + a.i))
              ELSE 0 END)::BIGINT AS dlo,
            sum(CASE WHEN a.g > b.g AND a.j * 8 + a.i >= 32
              THEN (1::BIGINT << (a.j * 8 + a.i - 32))
              ELSE 0 END)::BIGINT AS dhi
          FROM g9 a JOIN g9 b
            ON a.doc_id = b.doc_id AND a.j = b.j AND b.i = a.i + 1
          WHERE a.i < 8 GROUP BY 1),
        gs AS (SELECT doc_id, sum(g)::BIGINT AS su,
            sum(g * g)::BIGINT AS sq
          FROM px GROUP BY 1)
        SELECT ph.source, count(*)::BIGINT AS n_imgs,
          count(*)::BIGINT AS n_decoded,
          sum(gs.su)::BIGINT AS px_sum, sum(gs.sq)::BIGINT AS px_sumsq,
          sum(ph.phash % 1000000007)::BIGINT AS phash_fp,
          sum(dh.dlo % 1000000007)::BIGINT AS dlo_fp,
          sum(dh.dhi % 1000000007)::BIGINT AS dhi_fp
        FROM ph JOIN gs USING (doc_id) JOIN dh USING (doc_id)
        GROUP BY 1 ORDER BY 1"""
      },
      "The production feature-extraction operator oracle-gated: " +
        "withDecodedFeatures over real PNG bytes, every pixel-derived " +
        "column recomputed relationally — including the exact " +
        "scaled-integer area resample inside dHash. n_decoded == " +
        "n_imgs pins that the real decoder accepted every blob."),

    GraftQuery(
      "q_pipeline_images", Seq("P6", "D1", "J11", "D9"),
      (s, dir) => {
        // The IMAGE-corpus build funnel — the visual twin of
        // q_pipeline_corpus: raw media -> decode gate (corrupt blobs
        // drop: every 13th doc's second image is a truncated PNG) ->
        // luminance quality gate (brightness varies by doc_id%7
        // clipped shift; mean-gray >= 170 drops, cutting INSIDE every
        // source) -> pHash near-dup dedup (drop any image with a
        // smaller-id near-duplicate — banded candidates, hamming
        // verify; every 3rd doc plants a 1-pixel perturbation pair)
        // -> per-source funnel counts + survivor fingerprint. Runs
        // the production featuresColumn kernel once (checkpointed),
        // every stage is a filter/join over its output; the oracle
        // replays decode-free from the pixel definition.
        import graft.operators.{Multimodal, PixelDecode, Vp8lDecode}
        val mkBytes = udf((docId: Long, v: Int) => {
          val gray = new Array[Int](1024)
          val base = v == 0 || docId % 3 == 0
          val shift = (docId % 7).toInt * 20
          md5Fill(gray,
            blk => if (base) s"$docId:$blk" else s"$docId:b:$blk")
          var i = 0
          while (i < gray.length) {
            gray(i) = math.min(gray(i) + shift, 255); i += 1
          }
          if (v == 1 && docId % 3 == 0)
            gray(1023) = (gray(1023) + 1) % 256
          // container varies per doc — every 5th-ish doc's images ship
          // as LOSSLESS WEBP (VP8L: subtract-green + color cache)
          // instead of PNG; pixels identical, so the decode-free
          // pixel-replay oracle is unchanged and now pins the VP8L
          // decoder too. The corrupt leg truncates whichever container
          // the doc uses.
          val img =
            if (docId % 5 == 2)
              Vp8lDecode.encodeWebpLossless(32, 32,
                gray.map(g => (g << 16) | (g << 8) | g),
                cacheBits = 6, subtractGreen = true)
            else PixelDecode.encodePngGray(32, 32, gray)
          if (docId % 13 == 0 && v == 1) img.take(30) else img
        })
        // fanout BEFORE the encode/decode kernel: the narrow (doc_id,
        // source, v) rows shuffle, the blobs are synthesized after the
        // exchange — single-row-group scan otherwise runs the whole
        // kernel on one core (guide §2.6/§8)
        val imgs = Tables.fanout(Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("v", explode(array(lit(0), lit(1))))
          .withColumn("img", col("doc_id") * 2 + col("v")))
          .withColumn("media", mkBytes(col("doc_id"), col("v")))
        val feats = imgs
          .withColumn("mf", Multimodal.featuresColumn(col("media")))
          .select(col("source"), col("img"), col("mf.decoded"),
            col("mf.px_sum"), col("mf.phash"))
          .localCheckpoint(eager = false) // ONE kernel pass feeds every stage
        val live = feats.where(col("decoded"))
        val qual = live.where(expr("px_sum div 1024 < 170"))
          .localCheckpoint(eager = false)
        val bands = qual
          .withColumn("j", explode(sequence(lit(0), lit(6))))
          .withColumn("bk", expr("shiftright(phash, j * 9) & 511"))
          .select("img", "j", "bk")
        // funnel algebra (band candidates -> hamming verify ->
        // keep-smallest -> per-source rollup) via the shared
        // CorpusFunnel combinator; this query plugs only the pHash
        // band geometry and the hamming-<=6 verify
        import graft.operators.CorpusFunnel
        import graft.operators.CorpusFunnel.{AggStage, CountStage}
        val dup = CorpusFunnel.verifiedDupIds(bands, qual, "img",
          Seq("j", "bk"), "phash",
          (a, b) => bit_count(a.bitwiseXOR(b)) <= 6)
        val kept = CorpusFunnel.survivors(qual, dup, "img")
        CorpusFunnel.stageCounts("source", Seq(
          CountStage("n_raw", imgs),
          CountStage("n_decoded", live),
          CountStage("n_quality", qual),
          AggStage(kept.groupBy("source")
            .agg(count(lit(1)).as("n_unique"),
              sum(col("phash") % 1000000007L).as("kept_fp")),
            Seq("n_unique", "kept_fp"))))
      },
      Some {
        val ctvals = (for (u <- 0 until 8; x <- 0 until 32)
          yield s"($u,$x,${graft.operators.PixelDecode.DctCos(u)(x)})")
          .mkString(",")
        s"""WITH ct(u, x, cv) AS (SELECT * FROM (VALUES $ctvals) v(u, x, cv)),
        imgs AS (SELECT doc_id, source, v, doc_id * 2 + v AS img,
            (doc_id % 13 = 0 AND v = 1) AS corrupt
          FROM documents, (SELECT unnest([0, 1]) AS v)),
        live AS (SELECT * FROM imgs WHERE NOT corrupt),
        px AS (
          SELECT l.img, l.source, (i // 32) AS r, (i % 32) AS c,
            CASE WHEN l.v = 1 AND l.doc_id % 3 = 0 AND i = 1023
              THEN (least(('0x' || substr(md5(l.doc_id::VARCHAR || ':'
                || (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT
                + (l.doc_id % 7) * 20, 255) + 1) % 256
              WHEN l.v = 0 OR l.doc_id % 3 = 0
              THEN least(('0x' || substr(md5(l.doc_id::VARCHAR || ':'
                || (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT
                + (l.doc_id % 7) * 20, 255)
              ELSE least(('0x' || substr(md5(l.doc_id::VARCHAR || ':b:'
                || (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT
                + (l.doc_id % 7) * 20, 255)
            END AS g
          FROM live l, (SELECT unnest(range(1024)) AS i)),
        gs AS (SELECT img, sum(g)::BIGINT AS su FROM px GROUP BY 1),
        q AS (SELECT img FROM gs WHERE su // 1024 < 170),
        qpx AS (SELECT px.* FROM px JOIN q USING (img)),
        t1 AS (SELECT qpx.img, qpx.source, ct.u AS u, qpx.c AS y,
            sum(qpx.g * ct.cv)::BIGINT AS t
          FROM qpx JOIN ct ON ct.x = qpx.r GROUP BY 1, 2, 3, 4),
        co AS (SELECT t1.img, t1.source, t1.u AS u, ct.u AS v,
            sum(t1.t * ct.cv)::BIGINT AS coef
          FROM t1 JOIN ct ON ct.x = t1.y GROUP BY 1, 2, 3, 4),
        acs AS (SELECT img, source, u, v, coef,
            row_number() OVER (PARTITION BY img ORDER BY coef) AS rn
          FROM co WHERE NOT (u = 0 AND v = 0)),
        med AS (SELECT img, coef AS med FROM acs WHERE rn = 32),
        ph AS (SELECT a.img, a.source,
            sum(CASE WHEN a.coef > m.med
              THEN (1::BIGINT << (a.u * 8 + a.v - 1))
              ELSE 0 END)::BIGINT AS phash
          FROM acs a JOIN med m USING (img) GROUP BY 1, 2),
        bands AS (SELECT img, j, (phash >> (j * 9)) & 511 AS bk
          FROM ph, (SELECT unnest(range(7)) AS j)),
        cand AS (SELECT DISTINCT a.img AS ia, b.img AS ib
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.bk = b.bk AND a.img < b.img),
        dup AS (SELECT DISTINCT c.ib FROM cand c
          JOIN ph pa ON pa.img = c.ia JOIN ph pb ON pb.img = c.ib
          WHERE bit_count(xor(pa.phash, pb.phash)) <= 6),
        kept AS (SELECT ph.img, ph.source, ph.phash FROM ph
          LEFT JOIN dup ON dup.ib = ph.img WHERE dup.ib IS NULL)
        SELECT r.source, r.n_raw, l.n_decoded, qq.n_quality,
          k.n_unique, k.kept_fp
        FROM (SELECT source, count(*)::BIGINT AS n_raw
            FROM imgs GROUP BY 1) r
        JOIN (SELECT source, count(*)::BIGINT AS n_decoded
            FROM live GROUP BY 1) l USING (source)
        JOIN (SELECT source, count(*)::BIGINT AS n_quality
            FROM ph GROUP BY 1) qq USING (source)
        JOIN (SELECT source, count(*)::BIGINT AS n_unique,
            sum(phash % 1000000007)::BIGINT AS kept_fp
            FROM kept GROUP BY 1) k USING (source)
        ORDER BY source"""
      },
      "The image-corpus build funnel (the visual q_pipeline_corpus): " +
        "decode gate on real bytes (truncated PNGs AND lossless WebPs " +
        "drop — every 5th-ish doc ships VP8L-coded), luminance " +
        "quality gate cutting inside every source, banded pHash " +
        "near-dup dedup with keep-smallest canonicalization — " +
        "per-source funnel counts + survivor fingerprint, oracle " +
        "replayed decode-free from the pixel definition, container-" +
        "invariant across PNG and VP8L."),

    GraftQuery(
      "q_multimodal_keyframes", Seq("P6", "D9", "W4"),
      (s, dir) => {
        // Video KEYFRAME detection over really-decoded frames: each
        // doc is a 12-frame synthetic clip (a new scene every 4
        // frames; frames within a scene differ by 1-pixel jitter),
        // every frame PNG-roundtrips through the real decoder to a
        // dHash, and the shot-boundary rule is the classic
        // frame-to-frame hash delta — lag() per clip, keyframe =
        // first frame or hamming > 16. Within-scene jitter hashes to
        // hamming 0 and scene cuts to ~28-35, so the detector
        // recovers exactly the scene starts; the oracle replays
        // decode-free from the pixel definition. The per-clip window
        // is partitioned on doc_id (no global window), the kernel is
        // per-row — the 100 TB shape is scan + window + aggregate.
        import graft.operators.PixelDecode
        val kernel = udf((docId: Long, f: Int) => {
          val gray = new Array[Int](72)
          md5Fill(gray, blk => s"$docId:${f / 4}:$blk")
          gray(0) = (gray(0) + f % 4) % 256
          val png = PixelDecode.encodePngGray(9, 8, gray)
          val px = PixelDecode.decode(png).get
          val g = PixelDecode.grayLuma(px)
          val bits = PixelDecode.dHash(g, px.width, px.height)
          DhashStats(bits & 0xffffffffL, bits >>> 32)
        })
        val w = Window.partitionBy("doc_id").orderBy("f")
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("f", explode(sequence(lit(0), lit(11))))
          .withColumn("st", kernel(col("doc_id"), col("f")))
          .select(col("doc_id"), col("source"), col("f"),
            col("st.dlo"), col("st.dhi"))
          .withColumn("plo", lag("dlo", 1).over(w))
          .withColumn("phi", lag("dhi", 1).over(w))
          .withColumn("ham", when(col("plo").isNull, lit(null))
            .otherwise(expr(
              "bit_count(dlo ^ plo) + bit_count(dhi ^ phi)")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_frames"),
            sum(when(col("ham").isNull || col("ham") > 16, 1L)
              .otherwise(0L)).as("n_keyframes"),
            coalesce(sum("ham"), lit(0L)).as("total_motion"),
            sum(when(col("ham").isNull || col("ham") > 16,
              (col("doc_id") * 16 + col("f")) % 1000000007L)
              .otherwise(0L)).as("kf_fp"))
          .orderBy("source")
      },
      Some("""WITH px AS (
          SELECT doc_id, source, f, (i // 9) AS r, (i % 9) AS c,
            CASE WHEN i = 0 THEN
              (('0x' || substr(md5(doc_id::VARCHAR || ':' ||
                (f // 4)::VARCHAR || ':0'), 1, 2))::BIGINT + f % 4) % 256
            ELSE
              ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
                (f // 4)::VARCHAR || ':' || (i // 16)::VARCHAR),
                (i % 16) * 2 + 1, 2))::BIGINT
            END AS g
          FROM documents, (SELECT unnest(range(12)) AS f),
            (SELECT unnest(range(72)) AS i)),
        dh AS (
          SELECT a.doc_id, a.source, a.f,
            sum(CASE WHEN a.g > b.g AND a.r * 8 + a.c < 32
              THEN (1::BIGINT << (a.r * 8 + a.c))
              ELSE 0 END)::BIGINT AS dlo,
            sum(CASE WHEN a.g > b.g AND a.r * 8 + a.c >= 32
              THEN (1::BIGINT << (a.r * 8 + a.c - 32))
              ELSE 0 END)::BIGINT AS dhi
          FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.f = b.f
            AND a.r = b.r AND b.c = a.c + 1
          WHERE a.c < 8 GROUP BY 1, 2, 3),
        lagd AS (
          SELECT doc_id, source, f, dlo, dhi,
            lag(dlo) OVER (PARTITION BY doc_id ORDER BY f) AS plo,
            lag(dhi) OVER (PARTITION BY doc_id ORDER BY f) AS phi
          FROM dh),
        scored AS (
          SELECT doc_id, source, f,
            CASE WHEN plo IS NULL THEN NULL
              ELSE bit_count(xor(dlo, plo)) + bit_count(xor(dhi, phi))
            END AS ham
          FROM lagd)
        SELECT source, count(*)::BIGINT AS n_frames,
          sum(CASE WHEN ham IS NULL OR ham > 16 THEN 1 ELSE 0
            END)::BIGINT AS n_keyframes,
          coalesce(sum(ham), 0)::BIGINT AS total_motion,
          sum(CASE WHEN ham IS NULL OR ham > 16
            THEN (doc_id * 16 + f) % 1000000007 ELSE 0 END)::BIGINT
            AS kf_fp
        FROM scored GROUP BY 1 ORDER BY 1"""),
      "Video keyframe detection over really-decoded frames: per-clip " +
        "lag window on frame dHashes, shot boundary = hamming > 16 — " +
        "within-scene 1-pixel jitter hashes to 0 and scene cuts to " +
        "~32, so detected keyframes are exactly the scene starts; " +
        "oracle replays the detector from the pixel definition."),

    GraftQuery(
      "q_multimodal_neardup", Seq("D1", "J11", "P6"),
      (s, dir) => {
        // Image NEAR-DUP search on the banded-dedup discipline: two
        // PNG-roundtripped images per doc (every third doc's second
        // image is a 1-pixel perturbation of its first — a planted
        // near-dup; the rest get an independent image), pHash each,
        // band the 63 hash bits into 7 x 9-bit LSH keys, self-join on
        // (band, key) for candidates, verify candidates at hamming
        // <= 6. Pigeonhole guarantee: <= 6 differing bits cannot
        // dirty all 7 bands, so recall at the verify threshold is
        // exactly 1 — the oracle's n_planted_found == n_planted is a
        // MEASURED recall audit, and n_candidates documents that the
        // shuffle carries band-collision slivers, never all-pairs.
        import graft.operators.PixelDecode
        val kernel = udf((docId: Long, v: Int) => {
          val gray = new Array[Int](1024)
          val base = v == 0 || docId % 3 == 0
          md5Fill(gray,
            blk => if (base) s"$docId:$blk" else s"$docId:b:$blk")
          if (v == 1 && docId % 3 == 0)
            gray(1023) = (gray(1023) + 1) % 256
          val png = PixelDecode.encodePngGray(32, 32, gray)
          val px = PixelDecode.decode(png).get
          val g = PixelDecode.grayLuma(px)
          PixelDecode.pHash(g, px.width, px.height)
        })
        val docs = Tables.load(s, dir, "documents").select("doc_id")
        // materialize once: bands AND both pair sides consume it
        // (fanout first — the pHash kernel must not run single-task
        // over the one-row-group scan, guide §2.6)
        val ph = Tables.fanout(docs
          .withColumn("v", explode(array(lit(0), lit(1))))
          .withColumn("img", col("doc_id") * 2 + col("v")))
          .withColumn("phash", kernel(col("doc_id"), col("v")))
          .select("img", "phash")
          .localCheckpoint(eager = false)
        val bands = ph
          .withColumn("j", explode(sequence(lit(0), lit(6))))
          .withColumn("bk", expr("shiftright(phash, j * 9) & 511"))
          .select("img", "phash", "j", "bk")
        val cand = bands.select("img", "j", "bk").as("a")
          .join(bands.select("img", "j", "bk").as("b"),
            col("a.j") === col("b.j") && col("a.bk") === col("b.bk") &&
              col("a.img") < col("b.img"))
          .select(col("a.img").as("ia"), col("b.img").as("ib"))
          .distinct()
          .localCheckpoint(eager = false)
        val pairs = cand
          .join(ph.select(col("img").as("ia"), col("phash").as("pa")),
            Seq("ia"))
          .join(ph.select(col("img").as("ib"), col("phash").as("pb")),
            Seq("ib"))
          .withColumn("ham", expr("bit_count(pa ^ pb)"))
          .where(col("ham") <= 6)
          .localCheckpoint(eager = false)
        def metric(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("value"))
            .select(lit(name).as("metric"), col("value"))
        metric("n_imgs", ph)
          .unionAll(metric("n_candidates", cand))
          .unionAll(metric("n_pairs", pairs))
          .unionAll(metric("n_planted",
            docs.where(col("doc_id") % 3 === 0)))
          .unionAll(metric("n_planted_found",
            pairs.where(expr("ia div 2 = ib div 2"))))
          .orderBy("metric")
      },
      Some {
        val ctvals = (for (u <- 0 until 8; x <- 0 until 32)
          yield s"($u,$x,${graft.operators.PixelDecode.DctCos(u)(x)})")
          .mkString(",")
        s"""WITH ct(u, x, cv) AS (SELECT * FROM (VALUES $ctvals) v(u, x, cv)),
        imgs AS (SELECT doc_id, v
          FROM documents, (SELECT unnest([0, 1]) AS v)),
        px0 AS (
          SELECT doc_id, v, i,
            CASE WHEN v = 0 OR doc_id % 3 = 0
              THEN ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
                (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT
              ELSE ('0x' || substr(md5(doc_id::VARCHAR || ':b:' ||
                (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT
            END AS g0
          FROM imgs, (SELECT unnest(range(1024)) AS i)),
        px AS (
          SELECT doc_id * 2 + v AS img, (i // 32) AS r, (i % 32) AS c,
            CASE WHEN v = 1 AND doc_id % 3 = 0 AND i = 1023
              THEN (g0 + 1) % 256 ELSE g0 END AS g
          FROM px0),
        t1 AS (SELECT px.img, ct.u AS u, px.c AS y,
            sum(px.g * ct.cv)::BIGINT AS t
          FROM px JOIN ct ON ct.x = px.r GROUP BY 1, 2, 3),
        co AS (SELECT t1.img, t1.u AS u, ct.u AS v,
            sum(t1.t * ct.cv)::BIGINT AS coef
          FROM t1 JOIN ct ON ct.x = t1.y GROUP BY 1, 2, 3),
        acs AS (SELECT img, u, v, coef,
            row_number() OVER (PARTITION BY img ORDER BY coef) AS rn
          FROM co WHERE NOT (u = 0 AND v = 0)),
        med AS (SELECT img, coef AS med FROM acs WHERE rn = 32),
        ph AS (SELECT a.img,
            sum(CASE WHEN a.coef > m.med
              THEN (1::BIGINT << (a.u * 8 + a.v - 1))
              ELSE 0 END)::BIGINT AS phash
          FROM acs a JOIN med m USING (img) GROUP BY 1),
        bands AS (SELECT img, j, (phash >> (j * 9)) & 511 AS bk
          FROM ph, (SELECT unnest(range(7)) AS j)),
        cand AS (SELECT DISTINCT a.img AS ia, b.img AS ib
          FROM bands a JOIN bands b
            ON a.j = b.j AND a.bk = b.bk AND a.img < b.img),
        pairs AS (SELECT c.ia, c.ib,
            bit_count(xor(pa.phash, pb.phash)) AS ham
          FROM cand c JOIN ph pa ON pa.img = c.ia
            JOIN ph pb ON pb.img = c.ib)
        SELECT 'n_candidates' AS metric,
          (SELECT count(*) FROM cand)::BIGINT AS value
        UNION ALL SELECT 'n_imgs', (SELECT count(*) FROM ph)::BIGINT
        UNION ALL SELECT 'n_pairs',
          (SELECT count(*) FROM pairs WHERE ham <= 6)::BIGINT
        UNION ALL SELECT 'n_planted',
          (SELECT count(*) FROM documents WHERE doc_id % 3 = 0)::BIGINT
        UNION ALL SELECT 'n_planted_found',
          (SELECT count(*) FROM pairs
            WHERE ham <= 6 AND ia // 2 = ib // 2)::BIGINT
        ORDER BY metric"""
      },
      "Image near-duplicate search with the banded-dedup discipline: " +
        "pHash over PNG-roundtripped pixels, 7 x 9-bit LSH bands, " +
        "candidate self-join on band keys, hamming verify — planted " +
        "1-pixel perturbations recovered with measured 100% recall " +
        "(pigeonhole: <= 6 flipped bits never dirty all 7 bands) " +
        "while the shuffle carries only band-collision slivers."),

    GraftQuery(
      "q_multimodal_video", Seq("P6", "A8", "D9"),
      (s, dir) => {
        // Video-container metadata through the REAL ISO-BMFF box walk
        // (VideoHeader — the MP4 twin of q_multimodal_exif's IFD
        // walk): per doc, a spec-layout-complete MP4 is byte-built in
        // the kernel (ftyp + free + moov(mvhd + trak(tkhd 16.16 dims,
        // mdhd clock, hdlr, stbl/stsd codec fourcc)*) + mdat) with
        // id-derived geometry/clocks/codecs, then the PRODUCTION
        // parser walks the boxes back out. The oracle replays every
        // field from the id arithmetic, so equality pins the box-size
        // walk, the 16.16 fixed-point dims, the v0 full-box offsets,
        // the handler/codec fourcc reads, and both duration clocks
        // (movie 600 Hz vs video-track 90 kHz — same wall time by
        // construction, a cross-clock consistency proof). Scale
        // shape: blobs live one row at a time inside the kernel; the
        // only shuffle is the final (source, codec) aggregate.
        import graft.operators.VideoHeader
        val kernel = udf((docId: Long) => {
          val w = (16 * (1 + docId % 120)).toInt
          val h = (16 * (1 + docId * 3 % 120)).toInt
          val ticks = 600 + (docId % 1800) * 3
          val vCodec = Seq("avc1", "hev1", "av01")((docId % 3).toInt)
          val tracks = VideoHeader.TrackSpec(
              "vide", vCodec, w, h, 90000L, ticks * 150) +:
            (if (docId % 2 == 0)
              Seq(VideoHeader.TrackSpec(
                "soun", "mp4a", 0, 0, 48000L, ticks * 80))
            else Nil)
          val mp4 = VideoHeader.synthesizeMp4("mp42", 600L, ticks, tracks)
          val info = VideoHeader.parse(mp4).get
          val v = info.videoTracks.head
          (info.brand, info.durationMs, info.tracks.size, v.codec,
            v.width, v.height, v.durationMs, info.audioTracks.size)
        })
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("p", kernel(col("doc_id")))
          .select(col("source"), col("p._4").as("v_codec"),
            col("p._1").as("brand"), col("p._2").as("dur_ms"),
            col("p._3").as("n_tracks"), col("p._5").as("w"),
            col("p._6").as("h"), col("p._7").as("vdur_ms"),
            col("p._8").as("n_audio"))
          .groupBy("source", "v_codec")
          .agg(count(lit(1)).as("n_videos"),
            sum(when(col("brand") === "mp42", 1L).otherwise(0L))
              .as("n_mp42"),
            sum(col("n_tracks").cast("long")).as("n_tracks"),
            sum(col("n_audio").cast("long")).as("n_with_audio"),
            sum(col("w").cast("long")).as("sum_w"),
            sum(col("h").cast("long")).as("sum_h"),
            sum("dur_ms").as("sum_dur_ms"),
            sum("vdur_ms").as("sum_vdur_ms"),
            max("dur_ms").as("max_dur_ms"))
          .orderBy("source", "v_codec")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (16 * (1 + doc_id % 120))::BIGINT AS w,
            (16 * (1 + (doc_id * 3) % 120))::BIGINT AS h,
            (600 + (doc_id % 1800) * 3)::BIGINT AS ticks,
            CASE (doc_id % 3) WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
              ELSE 'av01' END AS v_codec,
            CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS has_audio
          FROM documents)
        SELECT source, v_codec, count(*)::BIGINT AS n_videos,
          count(*)::BIGINT AS n_mp42,
          sum(1 + has_audio)::BIGINT AS n_tracks,
          sum(has_audio)::BIGINT AS n_with_audio,
          sum(w)::BIGINT AS sum_w, sum(h)::BIGINT AS sum_h,
          sum((ticks * 1000) // 600)::BIGINT AS sum_dur_ms,
          sum((ticks * 150 * 1000) // 90000)::BIGINT AS sum_vdur_ms,
          max((ticks * 1000) // 600)::BIGINT AS max_dur_ms
        FROM d GROUP BY 1, 2 ORDER BY 1, 2"""),
      "MP4 metadata via the real ISO-BMFF box walk: byte-built " +
        "spec-complete containers re-parsed by the production " +
        "demuxer-grade walk (ftyp brand, mvhd/mdhd clocks, tkhd 16.16 " +
        "dims, hdlr/stsd fourccs), oracle-replayed from the id " +
        "arithmetic — the video twin of the EXIF IFD pin."),

    GraftQuery(
      "q_multimodal_audiofp", Seq("P6", "D9", "J11"),
      (s, dir) => {
        // Spectrogram landmark FINGERPRINT through the real WAV codec
        // path (AudioFingerprint — the retrieval-grade upgrade of
        // q_multimodal_audiohash's loudness envelope): the same
        // token-derived PCM16 clips as q_multimodal_audio are
        // WAV-encoded, sample-decoded back (pcm16Samples), then
        // fixed-point-DFT'd (pinned Q11 trig table), per-frame
        // spectral peaks picked (max |X_k|^2, ties to the low bin),
        // and consecutive-peak-triples hashed into 512-bucket
        // landmark ids. The oracle replays the whole computation
        // relationally — the trig table inlined as a VALUES relation,
        // peaks via a window rank, triples via self-joins — so
        // equality pins encode -> sample decode -> integer DFT ->
        // peak pick -> landmark hash end to end. Scale shape: one
        // clip per row inside the kernel; the only shuffles are the
        // doc-keyed regroup and the source aggregate.
        import graft.operators.{AudioFingerprint, AudioHeader, TextOps}
        val kernel = udf((samples: Seq[Int]) => {
          val wav = AudioHeader.synthesizeWavPcm16(
            8000, samples.map(_.toShort).toArray)
          val sm = AudioHeader.pcm16Samples(wav).get
          val peaks = AudioFingerprint.framePeaks(sm)
          val lms = AudioFingerprint.landmarks(sm)
          val p = 1000000007L
          FpStats(peaks.length.toLong,
            peaks.zipWithIndex.map { case (k, t) => (t * 31L + k) % p }.sum,
            lms.length.toLong,
            lms.map(_._2).distinct.length.toLong,
            lms.map { case (t, lid) => (t * 1000L + lid) % p }.sum)
        })
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 0)
          .withColumn("ts", TextOps.tokens("text"))
          .where(size(col("ts")) > 0)
          .withColumn("sm", expr(
            "transform(ts, (w, i) -> cast(" +
              TextOps.hash64("concat(doc_id, ':', i, ':', w)") +
              " % 65536 - 32768 as int))"))
          .withColumn("st", kernel(col("sm")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_clips"),
            sum("st.n_frames").as("n_frames"),
            sum("st.peak_fp").as("peak_fp"),
            sum("st.n_landmarks").as("n_landmarks"),
            sum("st.n_lids").as("n_lids"),
            sum("st.lm_fp").as("lm_fp"))
          .orderBy("source")
      },
      Some {
        val trig = graft.operators.AudioFingerprint.trigValuesSql
        s"""WITH tg(k, n, cq, sq) AS (SELECT * FROM (VALUES $trig) v(k, n, cq, sq)),
        d AS (SELECT doc_id, source,
            list_filter(string_split(text, ' '), x -> x != '') AS t
          FROM documents WHERE doc_id % 5 = 0),
        sm AS (SELECT doc_id, source, i - 1 AS pos,
            (('0x' || substr(md5(doc_id::VARCHAR || ':' ||
              (i - 1)::VARCHAR || ':' || t[i]), 1, 15))::BIGINT
              % 65536 - 32768)::BIGINT AS sv,
            len(t) AS n
          FROM (SELECT doc_id, source, t,
              unnest(range(1, len(t) + 1)) AS i
            FROM d WHERE len(t) > 0)),
        fr AS (SELECT doc_id, source, pos // 16 AS t, pos % 16 AS nn, sv
          FROM sm WHERE pos < (n // 16) * 16),
        sp AS (SELECT f.doc_id, f.source, f.t, tg.k,
            sum(f.sv * tg.cq)::BIGINT AS re,
            sum(f.sv * tg.sq)::BIGINT AS im
          FROM fr f JOIN tg ON tg.n = f.nn GROUP BY 1, 2, 3, 4),
        pk AS (SELECT doc_id, source, t, k,
            row_number() OVER (PARTITION BY doc_id, t
              ORDER BY re * re + im * im DESC, k ASC) AS rn
          FROM sp),
        peaks AS (SELECT doc_id, source, t, k FROM pk WHERE rn = 1),
        lm AS (SELECT a.doc_id, a.source, a.t,
            (a.k - 1) * 64 + (b.k - 1) * 8 + (c.k - 1) AS lid
          FROM peaks a
          JOIN peaks b ON b.doc_id = a.doc_id AND b.t = a.t + 1
          JOIN peaks c ON c.doc_id = a.doc_id AND c.t = a.t + 2),
        agg_f AS (SELECT source, count(*)::BIGINT AS n_frames,
            sum((t * 31 + k) % 1000000007)::BIGINT AS peak_fp
          FROM peaks GROUP BY 1),
        dl AS (SELECT doc_id, source,
            count(*)::BIGINT AS nlm,
            count(DISTINCT lid)::BIGINT AS nl,
            sum((t * 1000 + lid) % 1000000007)::BIGINT AS fp
          FROM lm GROUP BY 1, 2),
        agg_l AS (SELECT source, sum(nlm)::BIGINT AS n_landmarks,
            sum(nl)::BIGINT AS n_lids, sum(fp)::BIGINT AS lm_fp
          FROM dl GROUP BY 1),
        cl AS (SELECT source, count(*)::BIGINT AS n_clips
          FROM d WHERE len(t) > 0 GROUP BY 1)
        SELECT cl.source AS source, n_clips,
          coalesce(n_frames, 0)::BIGINT AS n_frames,
          coalesce(peak_fp, 0)::BIGINT AS peak_fp,
          coalesce(n_landmarks, 0)::BIGINT AS n_landmarks,
          coalesce(n_lids, 0)::BIGINT AS n_lids,
          coalesce(lm_fp, 0)::BIGINT AS lm_fp
        FROM cl LEFT JOIN agg_f USING (source)
          LEFT JOIN agg_l USING (source)
        ORDER BY source"""
      },
      "Spectrogram landmark fingerprints through the real WAV codec " +
        "path: fixed-point integer DFT over a pinned Q11 trig table, " +
        "per-frame spectral peaks, consecutive-triple landmark ids — " +
        "oracle replays the DFT, the peak rank, and the triple hash " +
        "relationally, the audio twin of the pHash DCT pin."),

    GraftQuery(
      "q_multimodal_audiodup", Seq("D1", "J11", "P6"),
      (s, dir) => {
        // Audio NEAR-DUP search on the banded-dedup discipline — the
        // audio twin of q_multimodal_neardup, with landmark ids as
        // the bands: clips in groups of three share a hash-derived
        // base stream, each member delayed by 0/1/2 whole frames of
        // leading silence (planted near-dups under time shift — the
        // transformation envelope hashes are blind to). Each clip is
        // WAV-encoded, sample-decoded, landmark-fingerprinted; the
        // catalog self-joins on landmark id (512 buckets — collision
        // slivers, never all-pairs), aligned-offset counts per
        // (pair, dt) verify candidates, and score >= 8 declares a
        // match. The oracle replays silence injection, DFT, peaks,
        // triples, and the aligned-offset verify relationally;
        // n_planted_found == n_planted is a MEASURED recall audit of
        // shift-invariant retrieval.
        import graft.operators.{AudioFingerprint, AudioHeader, TextOps}
        val kernel = udf((shift: Int, samples: Seq[Int]) => {
          val padded = new Array[Short](shift * 16) ++
            samples.map(_.toShort)
          val wav = AudioHeader.synthesizeWavPcm16(8000, padded)
          val sm = AudioHeader.pcm16Samples(wav).get
          AudioFingerprint.landmarks(sm).map { case (t, lid) =>
            t * 512 + lid
          }.toSeq
        })
        val clips = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("clip"), col("source"))
          .withColumn("g", expr("clip - clip % 15"))
          .withColumn("shift", expr("cast((clip % 15) div 5 as int)"))
        // Sample derivation stays the codegen'd explode + regroup
        // (measured the FASTEST of three shapes at sf0.1: 2.3s vs
        // 3.1s for a JVM-md5 in-kernel loop and 3.6s for an in-row
        // transform() — Spark HOF lambdas are interpreted, and the
        // skinny (clip, j, sv) shuffle costs less than either); the
        // token-derived audio queries, whose arrays are ~50x smaller,
        // use the shuffle-free transform shape instead.
        // fanoutBy(clip): parallelizes the derivation explode AND the
        // landmark kernel — the groupBy below reuses this keyed
        // exchange (no extra shuffle), and without it the kernel runs
        // on the one AQE-coalesced post-agg partition (guide §2.4/§2.6)
        val lmdf = Tables.fanoutBy(clips, col("clip"))
          .withColumn("j", explode(sequence(lit(0), lit(767))))
          .withColumn("sv",
            expr(TextOps.hash64("concat(g, ':', j)") +
              " % 65536 - 32768").cast("int"))
          .groupBy("clip", "g", "shift")
          .agg(sort_array(collect_list(struct(col("j"), col("sv"))))
            .as("ps"))
          .withColumn("v",
            explode(kernel(col("shift"), expr("transform(ps, x -> x.sv)"))))
          .select(col("clip"), col("g"),
            expr("v div 512").as("t"), expr("v % 512").as("lid"))
          .localCheckpoint(eager = false)
        val aligned = lmdf.as("a")
          .join(lmdf.as("b"),
            col("a.lid") === col("b.lid") && col("a.clip") < col("b.clip"))
          .groupBy(col("a.clip").as("ca"), col("b.clip").as("cb"),
            (col("b.t") - col("a.t")).as("dt"))
          .agg(count(lit(1)).as("n_al"))
          .localCheckpoint(eager = false)
        val best = aligned.groupBy("ca", "cb")
          .agg(max("n_al").as("score"))
        val matches = best.where(col("score") >= 8).localCheckpoint(eager = false)
        val planted = clips.as("a").join(clips.as("b"),
          col("a.g") === col("b.g") && col("a.clip") < col("b.clip"))
        val plantedFound = matches
          .join(clips.select(col("clip").as("ca"), col("g").as("ga")),
            Seq("ca"))
          .join(clips.select(col("clip").as("cb"), col("g").as("gb")),
            Seq("cb"))
          .where(col("ga") === col("gb"))
        def metric(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("value"))
            .select(lit(name).as("metric"), col("value"))
        metric("n_clips", clips)
          .unionAll(metric("n_landmarks", lmdf))
          .unionAll(metric("n_buckets", lmdf.select("lid").distinct()))
          .unionAll(metric("n_aligned_cells", aligned))
          .unionAll(metric("n_matches", matches))
          .unionAll(metric("n_planted", planted))
          .unionAll(metric("n_planted_found", plantedFound))
          .orderBy("metric")
      },
      Some {
        val trig = graft.operators.AudioFingerprint.trigValuesSql
        s"""WITH tg(k, n, cq, sq) AS (SELECT * FROM (VALUES $trig) v(k, n, cq, sq)),
        cl AS (SELECT doc_id AS clip, doc_id - doc_id % 15 AS g,
            (doc_id % 15) // 5 AS shift
          FROM documents WHERE doc_id % 5 = 0),
        sm AS (SELECT clip, j + shift * 16 AS pos,
            (('0x' || substr(md5(g::VARCHAR || ':' || j::VARCHAR),
              1, 15))::BIGINT % 65536 - 32768)::BIGINT AS sv
          FROM cl, (SELECT unnest(range(768)) AS j) r
          UNION ALL
          SELECT clip, j AS pos, 0::BIGINT AS sv
          FROM cl, (SELECT unnest(range(32)) AS j) r
          WHERE j < shift * 16),
        fr AS (SELECT clip, pos // 16 AS t, pos % 16 AS nn, sv FROM sm),
        sp AS (SELECT f.clip, f.t, tg.k,
            sum(f.sv * tg.cq)::BIGINT AS re,
            sum(f.sv * tg.sq)::BIGINT AS im
          FROM fr f JOIN tg ON tg.n = f.nn GROUP BY 1, 2, 3),
        pk AS (SELECT clip, t, k,
            row_number() OVER (PARTITION BY clip, t
              ORDER BY re * re + im * im DESC, k ASC) AS rn
          FROM sp),
        peaks AS (SELECT clip, t, k FROM pk WHERE rn = 1),
        lm AS (SELECT a.clip, a.t,
            (a.k - 1) * 64 + (b.k - 1) * 8 + (c.k - 1) AS lid
          FROM peaks a
          JOIN peaks b ON b.clip = a.clip AND b.t = a.t + 1
          JOIN peaks c ON c.clip = a.clip AND c.t = a.t + 2),
        aligned AS (SELECT a.clip AS ca, b.clip AS cb, b.t - a.t AS dt,
            count(*)::BIGINT AS n_al
          FROM lm a JOIN lm b ON a.lid = b.lid AND a.clip < b.clip
          GROUP BY 1, 2, 3),
        best AS (SELECT ca, cb, max(n_al) AS score
          FROM aligned GROUP BY 1, 2),
        matches AS (SELECT ca, cb FROM best WHERE score >= 8),
        planted AS (SELECT a.clip AS ca, b.clip AS cb
          FROM cl a JOIN cl b ON a.g = b.g AND a.clip < b.clip)
        SELECT 'n_aligned_cells' AS metric,
          (SELECT count(*) FROM aligned)::BIGINT AS value
        UNION ALL SELECT 'n_buckets',
          (SELECT count(DISTINCT lid) FROM lm)::BIGINT
        UNION ALL SELECT 'n_clips', (SELECT count(*) FROM cl)::BIGINT
        UNION ALL SELECT 'n_landmarks', (SELECT count(*) FROM lm)::BIGINT
        UNION ALL SELECT 'n_matches',
          (SELECT count(*) FROM matches)::BIGINT
        UNION ALL SELECT 'n_planted',
          (SELECT count(*) FROM planted)::BIGINT
        UNION ALL SELECT 'n_planted_found',
          (SELECT count(*) FROM matches m JOIN cl a ON a.clip = m.ca
            JOIN cl b ON b.clip = m.cb WHERE a.g = b.g)::BIGINT
        ORDER BY metric"""
      },
      "Audio near-duplicate retrieval with the banded-dedup " +
        "discipline: landmark fingerprints as 512-bucket LSH bands, " +
        "candidate self-join on landmark id, aligned-offset verify — " +
        "planted whole-frame time shifts recovered with a measured " +
        "recall audit, the shift-invariance the envelope hash lacks."),

    GraftQuery(
      "q_multimodal_mp4frames", Seq("P6", "A8", "D9"),
      (s, dir) => {
        // Container-TRUE frame sampling through the real demuxer path
        // (the upgrade of q_multimodal_frames' fixed-size substring
        // slicing): per doc, an MP4 with REAL sample tables is
        // byte-built (stts run, stsc chunk runs with a partial last
        // chunk, per-sample stsz sizes, absolute stco offsets patched
        // in a second pass), then the PRODUCTION operator
        // Multimodal.mp4FrameSample walks those tables back and
        // extracts every 3rd frame's exact mdat payload. The oracle
        // replays sizes, decode timestamps, and the payload BYTES
        // (md5 convention) from the id arithmetic — equality pins the
        // stsc/stco/stsz resolution and the byte-exact extraction,
        // not just counts. Scale shape: one blob per row in the
        // kernel; only shuffle is the source aggregate.
        import graft.operators.{Multimodal, VideoHeader}
        val mkMp4 = udf((docId: Long) => {
          val n = (6 + docId % 10).toInt
          val delta = 100 + (docId % 5) * 10
          val md = java.security.MessageDigest.getInstance("MD5")
          val samples = (0 until n).map { i =>
            val len = (8 + (docId + i) % 9).toInt
            md.digest(s"$docId:f$i".getBytes("US-ASCII")).take(len)
          }
          VideoHeader.synthesizeMp4WithSamples(
            "mp42", 600, n * delta,
            VideoHeader.TrackSpec("vide", "avc1", 320, 240, 600,
              n * delta),
            samples, delta, samplesPerChunk = 4)
        })
        val byteSum = udf((b: Array[Byte]) =>
          b.map(x => (x & 0xff).toLong).sum)
        // fanout before the mux+demux kernel (guide §2.6)
        val vids = Tables.fanout(Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source")))
          .withColumn("media", mkMp4(col("doc_id")))
        Multimodal.mp4FrameSample(vids, "media", stride = 3)
          .withColumn("bsum", byteSum(col("frame")))
          .groupBy("source")
          .agg(countDistinct("doc_id").as("n_videos"),
            count(lit(1)).as("n_frames"),
            sum("dts").as("sum_dts"),
            sum(octet_length(col("frame")).cast("long")).as("sum_bytes"),
            sum(col("bsum") % 1000000007L).as("byte_fp"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (6 + doc_id % 10)::BIGINT AS n,
            (100 + (doc_id % 5) * 10)::BIGINT AS delta
          FROM documents),
        fr AS (SELECT doc_id, source, i, delta,
            (8 + (doc_id + i) % 9)::BIGINT AS sz
          FROM (SELECT d.*, unnest(range(n)) AS i FROM d)
          WHERE i % 3 = 0),
        by AS (SELECT fr.doc_id, fr.source, fr.i, fr.sz,
            fr.i * fr.delta AS dts,
            ('0x' || substr(md5(fr.doc_id::VARCHAR || ':f' ||
              fr.i::VARCHAR), j * 2 + 1, 2))::BIGINT AS b
          FROM fr, (SELECT unnest(range(16)) AS j) js
          WHERE js.j < fr.sz),
        fsum AS (SELECT doc_id, source, i, any_value(sz) AS sz,
            any_value(dts) AS dts, sum(b)::BIGINT AS bsum
          FROM by GROUP BY 1, 2, 3)
        SELECT source, count(DISTINCT doc_id)::BIGINT AS n_videos,
          count(*)::BIGINT AS n_frames,
          sum(dts)::BIGINT AS sum_dts,
          sum(sz)::BIGINT AS sum_bytes,
          sum(bsum % 1000000007)::BIGINT AS byte_fp
        FROM fsum GROUP BY 1 ORDER BY 1"""),
      "Container-true MP4 frame sampling: real stts/stsc/stsz/stco " +
        "tables written and demuxed back by the production operator, " +
        "every 3rd frame's exact mdat payload extracted — oracle " +
        "replays sizes, decode timestamps, and payload bytes from the " +
        "id arithmetic, pinning byte-exact demuxer extraction."),

    GraftQuery(
      "q_multimodal_videodup", Seq("D1", "J11", "P6"),
      (s, dir) => {
        // VIDEO near-dup search — the video twin of
        // q_multimodal_audiodup, completing the per-modality dedup
        // matrix (text minhash / image pHash bands / audio landmarks /
        // video temporal shingles). Clips in groups of three share 12
        // md5-derived 9x8 frames; each member is delayed by 0/1/2
        // flat lead-in frames (time shift) AND brightened by
        // member*25 gray levels (re-grade) — the two transformations
        // byte hashes are blind to. Each clip is a REAL MP4 (PNG
        // frames inside real stts/stsc/stsz/stco sample tables); the
        // PRODUCTION operator Multimodal.videoShingles demuxes,
        // decodes every frame through the image kernel, and emits
        // 3-frame dHash shingles (dHash cancels the brightness,
        // shingle ids are shift-covariant). Banded self-join on sid +
        // aligned-offset verify, score >= 6 declares a match; the
        // oracle replays pixels, dHash bits, shingle folding, and the
        // verify relationally. n_planted_found == n_planted is the
        // measured recall audit; n_frames == n_shingles + 2*n_clips
        // pins that EVERY frame decoded (a dropped frame breaks a
        // shingle run and the derived count). Scale shape: the whole
        // clip rides on its one blob row (kernel is a stateless
        // projection, run ONCE behind a localCheckpoint); the only
        // joins are the sid-band candidate slivers — never all-pairs.
        import graft.operators.{Multimodal, PixelDecode, VideoHeader}
        val kernel = udf((g: Long, shift: Int) => {
          val bright = shift * 25
          val frames: Seq[Array[Byte]] =
            (0 until shift).map { _ =>
              PixelDecode.encodePngGray(9, 8, Array.fill(72)(bright))
            } ++ (0 until 12).map { c =>
              val gray = new Array[Int](72)
              md5Fill(gray, blk => s"vg$g:$c:$blk")
              PixelDecode.encodePngGray(9, 8,
                gray.map(_ % 200 + bright))
            }
          val dur = (12 + shift) * 100L
          VideoHeader.synthesizeMp4WithSamples("mp42", 600, dur,
            VideoHeader.TrackSpec("vide", "avc1", 9, 8, 600, dur),
            frames, 100, samplesPerChunk = 4)
        })
        val clips = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("clip"))
          .withColumn("g", expr("clip - clip % 15"))
          .withColumn("shift", expr("cast((clip % 15) div 5 as int)"))
        // fanout before the mux+demux+decode kernel — single-row-group
        // scan otherwise runs it on one core (guide §2.6)
        val sh = Multimodal.videoShingles(
            Tables.fanout(clips)
              .withColumn("media", kernel(col("g"), col("shift"))),
            "media")
          .localCheckpoint(eager = false)
        val aligned = sh.as("a")
          .join(sh.as("b"),
            col("a.sid") === col("b.sid") && col("a.clip") < col("b.clip"))
          .groupBy(col("a.clip").as("ca"), col("b.clip").as("cb"),
            (col("b.t") - col("a.t")).as("dt"))
          .agg(count(lit(1)).as("n_al"))
          .localCheckpoint(eager = false)
        val matches = aligned.groupBy("ca", "cb")
          .agg(max("n_al").as("score"))
          .where(col("score") >= 6)
          .localCheckpoint(eager = false)
        val planted = clips.as("a").join(clips.as("b"),
          col("a.g") === col("b.g") && col("a.clip") < col("b.clip"))
        val plantedFound = matches
          .join(clips.select(col("clip").as("ca"), col("g").as("ga")),
            Seq("ca"))
          .join(clips.select(col("clip").as("cb"), col("g").as("gb")),
            Seq("cb"))
          .where(col("ga") === col("gb"))
        def metric(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("value"))
            .select(lit(name).as("metric"), col("value"))
        def stat(name: String, value: org.apache.spark.sql.Column) =
          sh.agg(value.as("value"))
            .select(lit(name).as("metric"), col("value"))
        metric("n_clips", clips)
          .unionAll(stat("n_frames",
            count(lit(1)) + countDistinct(col("clip")) * 2))
          .unionAll(stat("n_shingles", count(lit(1))))
          .unionAll(stat("n_buckets", countDistinct(col("sid"))))
          .unionAll(stat("sid_fp", sum(col("sid") % 1000000007L)))
          .unionAll(metric("n_aligned_cells", aligned))
          .unionAll(metric("n_matches", matches))
          .unionAll(metric("n_planted", planted))
          .unionAll(metric("n_planted_found", plantedFound))
          .orderBy("metric")
      },
      Some("""WITH cl AS (SELECT doc_id AS clip, doc_id - doc_id % 15 AS g,
            ((doc_id % 15) // 5)::BIGINT AS shift
          FROM documents WHERE doc_id % 5 = 0),
        cpx AS (SELECT clip, tc + shift AS t, (i // 9) AS r, (i % 9) AS c,
            (('0x' || substr(md5('vg' || g::VARCHAR || ':' ||
                tc::VARCHAR || ':' || (i // 16)::VARCHAR),
              (i % 16) * 2 + 1, 2))::BIGINT % 200 + shift * 25) AS gpx
          FROM cl, (SELECT unnest(range(12)) AS tc) ts,
            (SELECT unnest(range(72)) AS i) ii),
        fh AS (
          SELECT a.clip, a.t,
            sum(CASE WHEN a.gpx > b.gpx AND a.r * 8 + a.c < 32
              THEN (1::BIGINT << (a.r * 8 + a.c)) ELSE 0 END)::BIGINT AS dlo,
            sum(CASE WHEN a.gpx > b.gpx AND a.r * 8 + a.c >= 32
              THEN (1::BIGINT << (a.r * 8 + a.c - 32))
              ELSE 0 END)::BIGINT AS dhi
          FROM cpx a JOIN cpx b ON b.clip = a.clip AND b.t = a.t
            AND b.r = a.r AND b.c = a.c + 1
          WHERE a.c < 8 GROUP BY 1, 2
          UNION ALL
          SELECT clip, li AS t, 0::BIGINT, 0::BIGINT
          FROM cl, (SELECT unnest(range(2)) AS li) ls WHERE li < shift),
        fk AS (SELECT clip, t, (dlo * 31 + dhi) % 1048573 AS fk FROM fh),
        sh AS (SELECT a.clip, a.t,
            (a.fk * 1048573 + b.fk) * 1048573 + c.fk AS sid
          FROM fk a JOIN fk b ON b.clip = a.clip AND b.t = a.t + 1
            JOIN fk c ON c.clip = a.clip AND c.t = a.t + 2),
        aligned AS (SELECT a.clip AS ca, b.clip AS cb, b.t - a.t AS dt,
            count(*)::BIGINT AS n_al
          FROM sh a JOIN sh b ON a.sid = b.sid AND a.clip < b.clip
          GROUP BY 1, 2, 3),
        best AS (SELECT ca, cb, max(n_al) AS score
          FROM aligned GROUP BY 1, 2),
        matches AS (SELECT ca, cb FROM best WHERE score >= 6),
        planted AS (SELECT a.clip AS ca, b.clip AS cb
          FROM cl a JOIN cl b ON a.g = b.g AND a.clip < b.clip)
        SELECT 'n_aligned_cells' AS metric,
          (SELECT count(*) FROM aligned)::BIGINT AS value
        UNION ALL SELECT 'n_buckets',
          (SELECT count(DISTINCT sid) FROM sh)::BIGINT
        UNION ALL SELECT 'n_clips', (SELECT count(*) FROM cl)::BIGINT
        UNION ALL SELECT 'n_frames',
          (SELECT sum(12 + shift) FROM cl)::BIGINT
        UNION ALL SELECT 'n_matches',
          (SELECT count(*) FROM matches)::BIGINT
        UNION ALL SELECT 'n_planted',
          (SELECT count(*) FROM planted)::BIGINT
        UNION ALL SELECT 'n_planted_found',
          (SELECT count(*) FROM matches m JOIN cl a ON a.clip = m.ca
            JOIN cl b ON b.clip = m.cb WHERE a.g = b.g)::BIGINT
        UNION ALL SELECT 'n_shingles', (SELECT count(*) FROM sh)::BIGINT
        UNION ALL SELECT 'sid_fp',
          (SELECT sum(sid % 1000000007) FROM sh)::BIGINT
        ORDER BY metric"""),
      "Video near-duplicate retrieval completing the per-modality " +
        "dedup matrix: real MP4 clips (PNG frames in real sample " +
        "tables) demuxed and decoded by the production shingle " +
        "operator, 3-frame dHash shingles as LSH bands, aligned-" +
        "offset verify — planted time shifts AND brightness re-grades " +
        "recovered with a measured recall audit, transformations " +
        "byte-level hashes are blind to."),

    GraftQuery(
      "q_pipeline_video", Seq("P6", "D1", "J11", "D9"),
      (s, dir) => {
        // The VIDEO-corpus build funnel — the temporal twin of
        // q_pipeline_images: raw containers -> demux gate (every 13th
        // clip's MP4 is truncated mid-moov; the hardened box walk
        // returns nothing, never throws) -> frame-count quality gate
        // (every 11th clip carries only 5 content frames; shingle
        // count n-2 < 6 drops it — a gate computed from the SAME
        // kernel pass, no second demux) -> temporal-shingle near-dup
        // dedup (groups of three share content under 0/1/2-frame
        // shifts + brightness re-grades; drop any clip with a
        // verified smaller-id match) -> per-source funnel counts +
        // survivor shingle fingerprint. The production
        // Multimodal.videoShingles kernel runs ONCE (checkpointed);
        // every stage is a filter/aggregate/banded-join over its
        // output. The oracle replays demux-free from the pixel
        // definition: corrupt clips by the id predicate, frame
        // counts from the plant arithmetic, dHash/shingle/verify
        // relationally.
        import graft.operators.{Multimodal, PixelDecode, VideoHeader}
        val kernel = udf((clip: Long, g: Long, shift: Int) => {
          val bright = shift * 25
          val nc = if (clip % 11 == 0) 5 else 12
          val frames: Seq[Array[Byte]] =
            (0 until shift).map { _ =>
              PixelDecode.encodePngGray(9, 8, Array.fill(72)(bright))
            } ++ (0 until nc).map { c =>
              val gray = new Array[Int](72)
              md5Fill(gray, blk => s"vp$g:$c:$blk")
              PixelDecode.encodePngGray(9, 8,
                gray.map(_ % 200 + bright))
            }
          val dur = (nc + shift) * 100L
          val mp4 = VideoHeader.synthesizeMp4WithSamples("mp42", 600,
            dur, VideoHeader.TrackSpec("vide", "avc1", 9, 8, 600, dur),
            frames, 100, samplesPerChunk = 4)
          if (clip % 13 == 0) mp4.take(40) else mp4
        })
        val clips = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("clip"), col("source"))
          .withColumn("g", expr("clip - clip % 15"))
          .withColumn("shift", expr("cast((clip % 15) div 5 as int)"))
        // fanout before the mux+demux+decode kernel (guide §2.6)
        val sh = Multimodal.videoShingles(
            Tables.fanout(clips).withColumn("media",
              kernel(col("clip"), col("g"), col("shift"))), "media")
          .localCheckpoint(eager = false)
        val perClip = sh.groupBy("clip", "source")
          .agg(count(lit(1)).as("n_sh"),
            sum(col("sid") % 1000000007L).as("fp"))
          .localCheckpoint(eager = false)
        val qual = perClip.where(col("n_sh") >= 6)
        val qsh = sh.join(qual.select("clip"), Seq("clip"))
        // funnel algebra via the shared CorpusFunnel combinator; this
        // query plugs the temporal-shingle band (sid) and the
        // aligned-offset >= 6 verify
        import graft.operators.CorpusFunnel
        import graft.operators.CorpusFunnel.{AggStage, CountStage}
        val dup = CorpusFunnel.alignedDupIds(qsh, "clip", "t", "sid", 6)
        val kept = CorpusFunnel.survivors(qual, dup, "clip")
        CorpusFunnel.stageCounts("source", Seq(
          CountStage("n_raw", clips),
          CountStage("n_demuxed", perClip),
          CountStage("n_quality", qual),
          AggStage(kept.groupBy("source")
            .agg(count(lit(1)).as("n_unique"),
              (sum("fp") % 1000000007L).as("kept_fp")),
            Seq("n_unique", "kept_fp"))))
      },
      Some("""WITH cl AS (SELECT doc_id AS clip, source,
            doc_id - doc_id % 15 AS g,
            ((doc_id % 15) // 5)::BIGINT AS shift,
            (doc_id % 13 = 0) AS corrupt,
            CASE WHEN doc_id % 11 = 0 THEN 5 ELSE 12 END AS nc
          FROM documents WHERE doc_id % 5 = 0),
        live AS (SELECT * FROM cl WHERE NOT corrupt),
        cpx AS (SELECT clip, tc + shift AS t, (i // 9) AS r,
            (i % 9) AS c,
            (('0x' || substr(md5('vp' || g::VARCHAR || ':' ||
                tc::VARCHAR || ':' || (i // 16)::VARCHAR),
              (i % 16) * 2 + 1, 2))::BIGINT % 200 + shift * 25) AS gpx
          FROM live, (SELECT unnest(range(12)) AS tc) ts,
            (SELECT unnest(range(72)) AS i) ii
          WHERE tc < nc),
        fh AS (
          SELECT a.clip, a.t,
            sum(CASE WHEN a.gpx > b.gpx AND a.r * 8 + a.c < 32
              THEN (1::BIGINT << (a.r * 8 + a.c)) ELSE 0 END)::BIGINT AS dlo,
            sum(CASE WHEN a.gpx > b.gpx AND a.r * 8 + a.c >= 32
              THEN (1::BIGINT << (a.r * 8 + a.c - 32))
              ELSE 0 END)::BIGINT AS dhi
          FROM cpx a JOIN cpx b ON b.clip = a.clip AND b.t = a.t
            AND b.r = a.r AND b.c = a.c + 1
          WHERE a.c < 8 GROUP BY 1, 2
          UNION ALL
          SELECT clip, li AS t, 0::BIGINT, 0::BIGINT
          FROM live, (SELECT unnest(range(2)) AS li) ls
          WHERE li < shift),
        fk AS (SELECT clip, t, (dlo * 31 + dhi) % 1048573 AS fk FROM fh),
        sh AS (SELECT a.clip, a.t,
            (a.fk * 1048573 + b.fk) * 1048573 + c.fk AS sid
          FROM fk a JOIN fk b ON b.clip = a.clip AND b.t = a.t + 1
            JOIN fk c ON c.clip = a.clip AND c.t = a.t + 2),
        pc AS (SELECT clip, count(*)::BIGINT AS n_sh,
            sum(sid % 1000000007)::BIGINT AS fp
          FROM sh GROUP BY 1),
        qual AS (SELECT clip, fp FROM pc WHERE n_sh >= 6),
        qsh AS (SELECT sh.* FROM sh JOIN qual USING (clip)),
        aligned AS (SELECT a.clip AS ca, b.clip AS cb, b.t - a.t AS dt,
            count(*)::BIGINT AS n_al
          FROM qsh a JOIN qsh b ON a.sid = b.sid AND a.clip < b.clip
          GROUP BY 1, 2, 3),
        dup AS (SELECT DISTINCT cb AS clip FROM aligned
          WHERE n_al >= 6),
        kept AS (SELECT q.clip, q.fp FROM qual q
          LEFT JOIN dup d ON d.clip = q.clip WHERE d.clip IS NULL)
        SELECT r.source, r.n_raw, dm.n_demuxed, qq.n_quality,
          k.n_unique, k.kept_fp
        FROM (SELECT source, count(*)::BIGINT AS n_raw
            FROM cl GROUP BY 1) r
        JOIN (SELECT source, count(*)::BIGINT AS n_demuxed
            FROM live GROUP BY 1) dm USING (source)
        JOIN (SELECT cl.source, count(*)::BIGINT AS n_quality
            FROM qual JOIN cl USING (clip) GROUP BY 1) qq
          USING (source)
        JOIN (SELECT cl.source, count(*)::BIGINT AS n_unique,
            (sum(kept.fp) % 1000000007)::BIGINT AS kept_fp
            FROM kept JOIN cl USING (clip) GROUP BY 1) k
          USING (source)
        ORDER BY source"""),
      "The video-corpus build funnel (the temporal q_pipeline_images): " +
        "demux gate on real truncated containers, frame-count quality " +
        "gate derived from the one kernel pass, temporal-shingle " +
        "near-dup dedup with keep-smallest canonicalization — " +
        "per-source funnel counts + survivor fingerprint, oracle " +
        "replayed demux-free from the pixel definition."),

    GraftQuery(
      "q_pipeline_audio", Seq("S8", "D1", "J11", "D9"),
      (s, dir) => {
        // The AUDIO-corpus build funnel, completing the per-modality
        // funnel matrix (text q_pipeline_corpus / image
        // q_pipeline_images / video q_pipeline_video / audio here):
        // raw WAV blobs -> decode gate (every 13th clip's RIFF
        // container is truncated mid-fmt; the hardened parser returns
        // nothing, never throws) -> duration quality gate on the
        // REAL decoded sample count (every 11th clip carries only 256
        // content samples; n_samples >= 512 drops it — equality with
        // the oracle's shift*16+nc arithmetic pins the codec's count)
        // -> landmark near-dup dedup (groups of three share a base
        // stream under 0/1/2-frame silence delays; aligned-offset
        // count >= 8 on the 512-bucket landmark bands, keep-smallest)
        // -> per-source funnel counts + survivor landmark
        // fingerprint. ONE decode+fingerprint kernel pass
        // (checkpointed) feeds every stage; sample derivation stays
        // the codegen'd explode + regroup (the measured-fastest shape
        // — see q_multimodal_audiodup).
        import graft.operators.{
          AudioCodecs, AudioFingerprint, AudioHeader, TextOps}
        val kernel = udf((clip: Long, shift: Int, samples: Seq[Int]) => {
          val padded = new Array[Short](shift * 16) ++
            samples.map(_.toShort)
          val wav0 = AudioHeader.synthesizeWavPcm16(8000, padded)
          val wav = if (clip % 13 == 0) wav0.take(20) else wav0
          // the UNIFIED codec entry point (AudioCodecs.samples — the
          // fmt-chunk dispatch): for these PCM16 containers it is the
          // identical decode, and compressed-WAV legs ride the same
          // gate in q_pipeline_wavcodec
          AudioCodecs.samples(wav) match {
            case Some(sm) => AudioFunnelRow(true, sm.length.toLong,
              AudioFingerprint.landmarks(sm)
                .map { case (t, lid) => t * 512 + lid }.toSeq)
            case None => AudioFunnelRow(false, 0L, Seq.empty)
          }
        })
        val clips = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("clip"), col("source"))
          .withColumn("g", expr("clip - clip % 15"))
          .withColumn("shift", expr("cast((clip % 15) div 5 as int)"))
          .withColumn("nc",
            expr("case when clip % 11 = 0 then 256 else 768 end"))
        // fanoutBy(clip): parallelizes the derivation explode AND the
        // codec kernel; the groupBy reuses the keyed exchange
        // (guide §2.4/§2.6)
        val feats = Tables.fanoutBy(clips, col("clip"))
          .withColumn("j", explode(expr("sequence(0, nc - 1)")))
          .withColumn("sv",
            expr(TextOps.hash64("concat(g, ':', j)") +
              " % 65536 - 32768").cast("int"))
          .groupBy("clip", "source", "shift")
          .agg(sort_array(collect_list(struct(col("j"), col("sv"))))
            .as("ps"))
          .withColumn("st", kernel(col("clip"), col("shift"),
            expr("transform(ps, x -> x.sv)")))
          .select(col("clip"), col("source"),
            col("st.decoded").as("decoded"),
            col("st.n_samples").as("n_samples"), col("st.lms").as("lms"))
          .localCheckpoint(eager = false)
        val live = feats.where(col("decoded"))
        val qual = live.where(col("n_samples") >= 512).localCheckpoint(eager = false)
        val lmdf = qual.select(col("clip"), explode(col("lms")).as("v"))
          .select(col("clip"), expr("v div 512").as("t"),
            expr("v % 512").as("lid"))
          .localCheckpoint(eager = false)
        // funnel algebra via the shared CorpusFunnel combinator; this
        // query plugs the landmark band (lid) and the aligned-offset
        // >= 8 verify
        import graft.operators.CorpusFunnel
        import graft.operators.CorpusFunnel.{AggStage, CountStage}
        val dup = CorpusFunnel.alignedDupIds(lmdf, "clip", "t", "lid", 8)
        val clFp = lmdf.groupBy("clip")
          .agg(sum((col("t") * 1000 + col("lid")) % 1000000007L).as("fp"))
        val kept = CorpusFunnel.survivors(qual, dup, "clip")
          .join(clFp, Seq("clip"))
        CorpusFunnel.stageCounts("source", Seq(
          CountStage("n_raw", clips),
          CountStage("n_decoded", live),
          CountStage("n_quality", qual),
          AggStage(kept.groupBy("source")
            .agg(count(lit(1)).as("n_unique"),
              (sum("fp") % 1000000007L).as("kept_fp")),
            Seq("n_unique", "kept_fp"))))
      },
      Some {
        val trig = graft.operators.AudioFingerprint.trigValuesSql
        s"""WITH tg(k, n, cq, sq) AS (SELECT * FROM (VALUES $trig) v(k, n, cq, sq)),
        cl AS (SELECT doc_id AS clip, source,
            doc_id - doc_id % 15 AS g,
            (doc_id % 15) // 5 AS shift,
            (doc_id % 13 = 0) AS corrupt,
            CASE WHEN doc_id % 11 = 0 THEN 256 ELSE 768 END AS nc
          FROM documents WHERE doc_id % 5 = 0),
        live AS (SELECT * FROM cl WHERE NOT corrupt),
        q AS (SELECT * FROM live WHERE shift * 16 + nc >= 512),
        sm AS (SELECT clip, j + shift * 16 AS pos,
            (('0x' || substr(md5(g::VARCHAR || ':' || j::VARCHAR),
              1, 15))::BIGINT % 65536 - 32768)::BIGINT AS sv
          FROM q, (SELECT unnest(range(768)) AS j) r
          WHERE j < nc
          UNION ALL
          SELECT clip, j AS pos, 0::BIGINT AS sv
          FROM q, (SELECT unnest(range(32)) AS j) r
          WHERE j < shift * 16),
        fr AS (SELECT clip, pos // 16 AS t, pos % 16 AS nn, sv FROM sm),
        sp AS (SELECT f.clip, f.t, tg.k,
            sum(f.sv * tg.cq)::BIGINT AS re,
            sum(f.sv * tg.sq)::BIGINT AS im
          FROM fr f JOIN tg ON tg.n = f.nn GROUP BY 1, 2, 3),
        pk AS (SELECT clip, t, k,
            row_number() OVER (PARTITION BY clip, t
              ORDER BY re * re + im * im DESC, k ASC) AS rn
          FROM sp),
        peaks AS (SELECT clip, t, k FROM pk WHERE rn = 1),
        lm AS (SELECT a.clip, a.t,
            (a.k - 1) * 64 + (b.k - 1) * 8 + (c.k - 1) AS lid
          FROM peaks a
          JOIN peaks b ON b.clip = a.clip AND b.t = a.t + 1
          JOIN peaks c ON c.clip = a.clip AND c.t = a.t + 2),
        aligned AS (SELECT a.clip AS ca, b.clip AS cb, b.t - a.t AS dt,
            count(*)::BIGINT AS n_al
          FROM lm a JOIN lm b ON a.lid = b.lid AND a.clip < b.clip
          GROUP BY 1, 2, 3),
        dup AS (SELECT DISTINCT cb AS clip FROM aligned
          WHERE n_al >= 8),
        clfp AS (SELECT clip,
            sum((t * 1000 + lid) % 1000000007)::BIGINT AS fp
          FROM lm GROUP BY 1),
        kept AS (SELECT q.clip, clfp.fp FROM q
          JOIN clfp ON clfp.clip = q.clip
          LEFT JOIN dup d ON d.clip = q.clip WHERE d.clip IS NULL)
        SELECT r.source, r.n_raw, dc.n_decoded, qq.n_quality,
          k.n_unique, k.kept_fp
        FROM (SELECT source, count(*)::BIGINT AS n_raw
            FROM cl GROUP BY 1) r
        JOIN (SELECT source, count(*)::BIGINT AS n_decoded
            FROM live GROUP BY 1) dc USING (source)
        JOIN (SELECT source, count(*)::BIGINT AS n_quality
            FROM q GROUP BY 1) qq USING (source)
        JOIN (SELECT cl.source, count(*)::BIGINT AS n_unique,
            (sum(kept.fp) % 1000000007)::BIGINT AS kept_fp
            FROM kept JOIN cl USING (clip) GROUP BY 1) k
          USING (source)
        ORDER BY source"""
      },
      "The audio-corpus build funnel completing the per-modality " +
        "matrix: RIFF decode gate on truncated containers, a duration " +
        "quality gate on the REAL decoded sample count, landmark " +
        "near-dup dedup with keep-smallest canonicalization — " +
        "per-source funnel counts + survivor landmark fingerprint, " +
        "the DFT/peak/triple chain replayed relationally."),

    GraftQuery(
      "q_pipeline_flac", Seq("S8", "D1", "J11", "D9"),
      (s, dir) => {
        // The FLAC leg of the audio funnel — COMPRESSED audio through
        // the full corpus build, and the 5th-modality proof of the
        // CorpusFunnel plug discipline: the only modality-specific
        // code below is the kernel (FLAC fixed-predictor encode in
        // the fixture UDF, FlacDecode.pcm16Samples + landmarks in the
        // decode UDF); gates, banded near-dup, keep-smallest, and the
        // rollup all ride the shared combinator. The oracle replays
        // the SAME sample arithmetic as q_pipeline_audio's (FLAC is
        // lossless, so the decoded stream must equal the encoder
        // input bit-for-bit — a rice/CRC/predictor slip anywhere in
        // the distributed decode changes the landmark fingerprint and
        // fails the hash). Every 13th clip's stream is truncated
        // mid-frame: the CRC-gated decoder returns None, never wrong
        // samples — the decode gate the batch funnel counts.
        import graft.operators.{
          AudioFingerprint, FlacDecode, OggHeader, TextOps}
        val kernel = udf((clip: Long, shift: Int, samples: Seq[Int]) => {
          val padded = new Array[Short](shift * 16) ++
            samples.map(_.toShort)
          // subframe coding varies per clip — fixed-predictor plus
          // low- and high-order LPC (the coding real encoders emit
          // almost exclusively) — while the oracle keeps replaying
          // the encoder INPUT: losslessness across every coding is
          // exactly what the unchanged landmark hash pins
          val sf = (clip % 3) match {
            case 0 => "fixed2"
            case 1 => "lpc4"
            case _ => "lpc12"
          }
          val flac0 = FlacDecode.synthesizeFlacPcm16(8000, padded,
            blockSize = 192, subframe = sf)
          // every 4th clip ships as Ogg-FLAC (.oga): same stream
          // wrapped in Ogg pages, decoded through the packet
          // reassembly — a lossless wrap, so the oracle is unchanged
          // and the hash pins the page walk too; its corrupt leg
          // truncates the CONTAINER (page CRC/bounds fail)
          val sm =
            if (clip % 4 == 1) {
              val oga0 = OggHeader.synthesizeOggFlac(flac0)
              val oga = if (clip % 13 == 0) oga0.take(60) else oga0
              OggHeader.oggFlacStream(oga)
                .flatMap(FlacDecode.pcm16Samples)
            } else {
              val flac = if (clip % 13 == 0) flac0.take(50) else flac0
              FlacDecode.pcm16Samples(flac)
            }
          sm match {
            case Some(s) => AudioFunnelRow(true, s.length.toLong,
              AudioFingerprint.landmarks(s)
                .map { case (t, lid) => t * 512 + lid }.toSeq)
            case None => AudioFunnelRow(false, 0L, Seq.empty)
          }
        })
        val clips = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 3)
          .select(col("doc_id").as("clip"), col("source"))
          .withColumn("g", expr("clip - clip % 15"))
          .withColumn("shift", expr("cast((clip % 15) div 5 as int)"))
          .withColumn("nc",
            expr("case when clip % 11 = 0 then 256 else 768 end"))
        // fanoutBy(clip): parallelizes the derivation explode AND the
        // codec kernel; the groupBy reuses the keyed exchange
        // (guide §2.4/§2.6)
        val feats = Tables.fanoutBy(clips, col("clip"))
          .withColumn("j", explode(expr("sequence(0, nc - 1)")))
          .withColumn("sv",
            expr(TextOps.hash64("concat(g, ':', j)") +
              " % 65536 - 32768").cast("int"))
          .groupBy("clip", "source", "shift")
          .agg(sort_array(collect_list(struct(col("j"), col("sv"))))
            .as("ps"))
          .withColumn("st", kernel(col("clip"), col("shift"),
            expr("transform(ps, x -> x.sv)")))
          .select(col("clip"), col("source"),
            col("st.decoded").as("decoded"),
            col("st.n_samples").as("n_samples"), col("st.lms").as("lms"))
          .localCheckpoint(eager = false)
        val live = feats.where(col("decoded"))
        val qual = live.where(col("n_samples") >= 512).localCheckpoint(eager = false)
        val lmdf = qual.select(col("clip"), explode(col("lms")).as("v"))
          .select(col("clip"), expr("v div 512").as("t"),
            expr("v % 512").as("lid"))
          .localCheckpoint(eager = false)
        import graft.operators.CorpusFunnel
        import graft.operators.CorpusFunnel.{AggStage, CountStage}
        val dup = CorpusFunnel.alignedDupIds(lmdf, "clip", "t", "lid", 8)
        val clFp = lmdf.groupBy("clip")
          .agg(sum((col("t") * 1000 + col("lid")) % 1000000007L).as("fp"))
        val kept = CorpusFunnel.survivors(qual, dup, "clip")
          .join(clFp, Seq("clip"))
        CorpusFunnel.stageCounts("source", Seq(
          CountStage("n_raw", clips),
          CountStage("n_decoded", live),
          CountStage("n_quality", qual),
          AggStage(kept.groupBy("source")
            .agg(count(lit(1)).as("n_unique"),
              (sum("fp") % 1000000007L).as("kept_fp")),
            Seq("n_unique", "kept_fp"))))
      },
      Some {
        val trig = graft.operators.AudioFingerprint.trigValuesSql
        s"""WITH tg(k, n, cq, sq) AS (SELECT * FROM (VALUES $trig) v(k, n, cq, sq)),
        cl AS (SELECT doc_id AS clip, source,
            doc_id - doc_id % 15 AS g,
            (doc_id % 15) // 5 AS shift,
            (doc_id % 13 = 0) AS corrupt,
            CASE WHEN doc_id % 11 = 0 THEN 256 ELSE 768 END AS nc
          FROM documents WHERE doc_id % 5 = 3),
        live AS (SELECT * FROM cl WHERE NOT corrupt),
        q AS (SELECT * FROM live WHERE shift * 16 + nc >= 512),
        sm AS (SELECT clip, j + shift * 16 AS pos,
            (('0x' || substr(md5(g::VARCHAR || ':' || j::VARCHAR),
              1, 15))::BIGINT % 65536 - 32768)::BIGINT AS sv
          FROM q, (SELECT unnest(range(768)) AS j) r
          WHERE j < nc
          UNION ALL
          SELECT clip, j AS pos, 0::BIGINT AS sv
          FROM q, (SELECT unnest(range(32)) AS j) r
          WHERE j < shift * 16),
        fr AS (SELECT clip, pos // 16 AS t, pos % 16 AS nn, sv FROM sm),
        sp AS (SELECT f.clip, f.t, tg.k,
            sum(f.sv * tg.cq)::BIGINT AS re,
            sum(f.sv * tg.sq)::BIGINT AS im
          FROM fr f JOIN tg ON tg.n = f.nn GROUP BY 1, 2, 3),
        pk AS (SELECT clip, t, k,
            row_number() OVER (PARTITION BY clip, t
              ORDER BY re * re + im * im DESC, k ASC) AS rn
          FROM sp),
        peaks AS (SELECT clip, t, k FROM pk WHERE rn = 1),
        lm AS (SELECT a.clip, a.t,
            (a.k - 1) * 64 + (b.k - 1) * 8 + (c.k - 1) AS lid
          FROM peaks a
          JOIN peaks b ON b.clip = a.clip AND b.t = a.t + 1
          JOIN peaks c ON c.clip = a.clip AND c.t = a.t + 2),
        aligned AS (SELECT a.clip AS ca, b.clip AS cb, b.t - a.t AS dt,
            count(*)::BIGINT AS n_al
          FROM lm a JOIN lm b ON a.lid = b.lid AND a.clip < b.clip
          GROUP BY 1, 2, 3),
        dup AS (SELECT DISTINCT cb AS clip FROM aligned
          WHERE n_al >= 8),
        clfp AS (SELECT clip,
            sum((t * 1000 + lid) % 1000000007)::BIGINT AS fp
          FROM lm GROUP BY 1),
        kept AS (SELECT q.clip, clfp.fp FROM q
          JOIN clfp ON clfp.clip = q.clip
          LEFT JOIN dup d ON d.clip = q.clip WHERE d.clip IS NULL)
        SELECT r.source, r.n_raw, dc.n_decoded, qq.n_quality,
          k.n_unique, k.kept_fp
        FROM (SELECT source, count(*)::BIGINT AS n_raw
            FROM cl GROUP BY 1) r
        JOIN (SELECT source, count(*)::BIGINT AS n_decoded
            FROM live GROUP BY 1) dc USING (source)
        JOIN (SELECT source, count(*)::BIGINT AS n_quality
            FROM q GROUP BY 1) qq USING (source)
        JOIN (SELECT cl.source, count(*)::BIGINT AS n_unique,
            (sum(kept.fp) % 1000000007)::BIGINT AS kept_fp
            FROM kept JOIN cl USING (clip) GROUP BY 1) k
          USING (source)
        ORDER BY 1"""
      },
      "COMPRESSED audio through the corpus funnel: FLAC streams " +
        "(fixed-predictor AND LPC codings) decode bit-exactly (rice " +
        "residuals, CRC-8/16 verified) before the same gate/near-dup/" +
        "rollup plugs as the WAV leg, with every 4th clip wrapped as " +
        "Ogg-FLAC and decoded through the page-walk packet " +
        "reassembly — the oracle replays the encoder INPUT, so any " +
        "decode or reassembly slip fails the landmark hash; truncated " +
        "streams/pages drop at the CRC-gated decode gate."),

    GraftQuery(
      "q_multimodal_g711", Seq("S8", "P6", "A8"),
      (s, dir) => {
        // G.711 telephony audio (ITU-T µ-law / A-law WAV, one code
        // byte per sample) decoded exactly through the container:
        // per doc a code stream derived from md5 digests, µ-law for
        // even docs / A-law for odd, decoded by AudioCodecs.samples
        // and reduced to exact integer stats per (source, law). The
        // oracle replays the SAME code derivation relationally and
        // decodes through the published 256-entry table inlined as a
        // VALUES relation (the trig-table discipline: the table's
        // values are spec-pinned against the ITU endpoints in
        // AudioCodecsSpec; the query pins the distributed container
        // walk + per-byte decode + rollup). One blob per row; only
        // the (source, law) rollup shuffles.
        import graft.operators.AudioCodecs
        val mkWav = udf((docId: Long) => {
          val md = java.security.MessageDigest.getInstance("MD5")
          val codes = (0 until 6).flatMap(k =>
            md.digest(s"g7$docId:$k".getBytes("US-ASCII"))).toArray
          AudioCodecs.synthesizeWavG711Codes(8000, codes,
            if (docId % 2 == 0) "ulaw" else "alaw")
        })
        val stats = udf((media: Array[Byte]) =>
          AudioCodecs.samples(media) match {
            case Some(sm) =>
              var peak = 0; var sv = 0L; var sq = 0L
              sm.foreach { x =>
                val v = x.toInt
                if (math.abs(v) > peak) peak = math.abs(v)
                sv += v
                sq += v.toLong * v
              }
              (sm.length.toLong, peak, sv, sq % 1000000007L)
            case None => (0L, 0, 0L, 0L)
          })
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 7 === 1)
          .select(col("doc_id"), col("source"))
          .withColumn("law", when(col("doc_id") % 2 === 0, lit("ulaw"))
            .otherwise(lit("alaw")))
          .withColumn("st", stats(mkWav(col("doc_id"))))
          .groupBy("source", "law")
          .agg(count(lit(1)).as("n_clips"),
            sum(col("st._1")).as("n_samples"),
            sum(col("st._2")).as("peak_sum"),
            sum(col("st._3")).as("val_sum"),
            sum(col("st._4")).as("sumsq_fp"))
          .orderBy("source", "law")
      },
      Some {
        val table = (0 until 256).map(c =>
          s"($c,${graft.operators.AudioCodecs.muLawDecode(c)}," +
            s"${graft.operators.AudioCodecs.aLawDecode(c)})")
          .mkString(",")
        s"""WITH g711(code, mu, al) AS (SELECT * FROM (VALUES $table)
          v(code, mu, al)),
        d AS (SELECT doc_id, source,
            CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS law
          FROM documents WHERE doc_id % 7 = 1),
        cb AS (SELECT d.doc_id, d.source, d.law, j,
            ('0x' || substr(md5('g7' || doc_id::VARCHAR || ':' ||
              (j // 16)::VARCHAR), (j % 16) * 2 + 1, 2))::INT AS code
          FROM d, (SELECT unnest(range(96)) AS j)),
        sv AS (SELECT cb.doc_id, cb.source, cb.law,
            CASE WHEN cb.law = 'ulaw' THEN g.mu ELSE g.al END AS v
          FROM cb JOIN g711 g ON g.code = cb.code),
        pc AS (SELECT doc_id, source, law, count(*)::BIGINT AS n,
            max(abs(v))::BIGINT AS peak, sum(v)::BIGINT AS sv,
            (sum(v * v) % 1000000007)::BIGINT AS sq
          FROM sv GROUP BY 1, 2, 3)
        SELECT source, law, count(*)::BIGINT AS n_clips,
          sum(n)::BIGINT AS n_samples, sum(peak)::BIGINT AS peak_sum,
          sum(sv)::BIGINT AS val_sum, sum(sq)::BIGINT AS sumsq_fp
        FROM pc GROUP BY 1, 2 ORDER BY 1, 2"""
      },
      "G.711 telephony WAVs (µ-law even docs, A-law odd) decoded " +
        "exactly through the RIFF container — per-(source, law) " +
        "integer stats replayed by the oracle from the md5 code " +
        "derivation joined to the published decode table as VALUES, " +
        "pinning the distributed byte-level decode."),

    GraftQuery(
      "q_pipeline_gif", Seq("P6", "D1", "J11", "D9"),
      (s, dir) => {
        // The ANIMATED-GIF corpus funnel — the same temporal-shingle
        // discipline as q_pipeline_video over a DIFFERENT container:
        // full GIF89a animation decode (LZW, GCE, compositing) feeds
        // the SAME dHash/shingle kernel, so the funnel algebra is the
        // CorpusFunnel plugs verbatim and the oracle is the video
        // oracle's pixel replay (gifShingleRows and videoShingleRows
        // are spec-pinned to produce identical keys for identical
        // frames — GifAnimSpec). Truncated GIFs (every 13th, cut
        // inside the palette) fail the decode gate; every 11th clip
        // carries only 5 content frames (quality gate); groups of
        // three share content under 0/1/2-frame shifts + brightness
        // re-grades (near-dup keep-smallest).
        import graft.operators.{Multimodal, PixelDecode}
        val kernel = udf((clip: Long, g: Long, shift: Int) => {
          val bright = shift * 25
          val nc = if (clip % 11 == 0) 5 else 12
          val frames: Seq[Array[Int]] =
            (0 until shift).map(_ => Array.fill(72)(bright)) ++
              (0 until nc).map { c =>
                val gray = new Array[Int](72)
                md5Fill(gray, blk => s"vp$g:$c:$blk")
                gray.map(_ % 200 + bright)
              }
          val gif = PixelDecode.encodeGifGrayAnimated(9, 8, frames)
          if (clip % 13 == 0) gif.take(40) else gif
        })
        val clips = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 2)
          .select(col("doc_id").as("clip"), col("source"))
          .withColumn("g", expr("clip - clip % 15"))
          .withColumn("shift", expr("cast((clip % 15) div 5 as int)"))
        val sh = Multimodal.gifShingles(
            clips.withColumn("media",
              kernel(col("clip"), col("g"), col("shift"))), "media")
          .localCheckpoint(eager = false)
        val perClip = sh.groupBy("clip", "source")
          .agg(count(lit(1)).as("n_sh"),
            sum(col("sid") % 1000000007L).as("fp"))
          .localCheckpoint(eager = false)
        val qual = perClip.where(col("n_sh") >= 6)
        val qsh = sh.join(qual.select("clip"), Seq("clip"))
        import graft.operators.CorpusFunnel
        import graft.operators.CorpusFunnel.{AggStage, CountStage}
        val dup = CorpusFunnel.alignedDupIds(qsh, "clip", "t", "sid", 6)
        val kept = CorpusFunnel.survivors(qual, dup, "clip")
        CorpusFunnel.stageCounts("source", Seq(
          CountStage("n_raw", clips),
          CountStage("n_demuxed", perClip),
          CountStage("n_quality", qual),
          AggStage(kept.groupBy("source")
            .agg(count(lit(1)).as("n_unique"),
              (sum("fp") % 1000000007L).as("kept_fp")),
            Seq("n_unique", "kept_fp"))))
      },
      Some("""WITH cl AS (SELECT doc_id AS clip, source,
            doc_id - doc_id % 15 AS g,
            ((doc_id % 15) // 5)::BIGINT AS shift,
            (doc_id % 13 = 0) AS corrupt,
            CASE WHEN doc_id % 11 = 0 THEN 5 ELSE 12 END AS nc
          FROM documents WHERE doc_id % 5 = 2),
        live AS (SELECT * FROM cl WHERE NOT corrupt),
        cpx AS (SELECT clip, tc + shift AS t, (i // 9) AS r,
            (i % 9) AS c,
            (('0x' || substr(md5('vp' || g::VARCHAR || ':' ||
                tc::VARCHAR || ':' || (i // 16)::VARCHAR),
              (i % 16) * 2 + 1, 2))::BIGINT % 200 + shift * 25) AS gpx
          FROM live, (SELECT unnest(range(12)) AS tc) ts,
            (SELECT unnest(range(72)) AS i) ii
          WHERE tc < nc),
        fh AS (
          SELECT a.clip, a.t,
            sum(CASE WHEN a.gpx > b.gpx AND a.r * 8 + a.c < 32
              THEN (1::BIGINT << (a.r * 8 + a.c)) ELSE 0 END)::BIGINT AS dlo,
            sum(CASE WHEN a.gpx > b.gpx AND a.r * 8 + a.c >= 32
              THEN (1::BIGINT << (a.r * 8 + a.c - 32))
              ELSE 0 END)::BIGINT AS dhi
          FROM cpx a JOIN cpx b ON b.clip = a.clip AND b.t = a.t
            AND b.r = a.r AND b.c = a.c + 1
          WHERE a.c < 8 GROUP BY 1, 2
          UNION ALL
          SELECT clip, li AS t, 0::BIGINT, 0::BIGINT
          FROM live, (SELECT unnest(range(2)) AS li) ls
          WHERE li < shift),
        fk AS (SELECT clip, t, (dlo * 31 + dhi) % 1048573 AS fk FROM fh),
        sh AS (SELECT a.clip, a.t,
            (a.fk * 1048573 + b.fk) * 1048573 + c.fk AS sid
          FROM fk a JOIN fk b ON b.clip = a.clip AND b.t = a.t + 1
            JOIN fk c ON c.clip = a.clip AND c.t = a.t + 2),
        pc AS (SELECT clip, count(*)::BIGINT AS n_sh,
            sum(sid % 1000000007)::BIGINT AS fp
          FROM sh GROUP BY 1),
        qual AS (SELECT clip, fp FROM pc WHERE n_sh >= 6),
        qsh AS (SELECT sh.* FROM sh JOIN qual USING (clip)),
        aligned AS (SELECT a.clip AS ca, b.clip AS cb, b.t - a.t AS dt,
            count(*)::BIGINT AS n_al
          FROM qsh a JOIN qsh b ON a.sid = b.sid AND a.clip < b.clip
          GROUP BY 1, 2, 3),
        dup AS (SELECT DISTINCT cb AS clip FROM aligned
          WHERE n_al >= 6),
        kept AS (SELECT q.clip, q.fp FROM qual q
          LEFT JOIN dup d ON d.clip = q.clip WHERE d.clip IS NULL)
        SELECT r.source, r.n_raw, dm.n_demuxed, qq.n_quality,
          k.n_unique, k.kept_fp
        FROM (SELECT source, count(*)::BIGINT AS n_raw
            FROM cl GROUP BY 1) r
        JOIN (SELECT source, count(*)::BIGINT AS n_demuxed
            FROM live GROUP BY 1) dm USING (source)
        JOIN (SELECT cl.source, count(*)::BIGINT AS n_quality
            FROM qual JOIN cl USING (clip) GROUP BY 1) qq
          USING (source)
        JOIN (SELECT cl.source, count(*)::BIGINT AS n_unique,
            (sum(kept.fp) % 1000000007)::BIGINT AS kept_fp
            FROM kept JOIN cl USING (clip) GROUP BY 1) k
          USING (source)
        ORDER BY source"""),
      "Animated GIFs through the corpus funnel: full GIF89a " +
        "animation decode (LZW + compositing) into the SAME temporal " +
        "dHash-shingle space as MP4s, the funnel algebra via the " +
        "shared CorpusFunnel plugs — truncated palettes drop at the " +
        "decode gate, the oracle replays pixels/dHash/shingles " +
        "relationally."),

    GraftQuery(
      "q_pipeline_anim", Seq("P6", "D1", "J11", "D9"),
      (s, dir) => {
        // CROSS-CONTAINER animation dedup — the oracle-proven form of
        // the "one fingerprint space" claim: each content group ships
        // the SAME md5-derived frames as an animated GIF (leg 0) and
        // as an APNG (leg 1, one pad frame ahead + a +25 brightness
        // re-grade), both decode through the container-dispatching
        // animShingles kernel into the one base-M shingle space, and
        // the aligned-offset verify must drop every APNG against its
        // GIF twin (dt = 1 — dHash cancels the re-grade, the shingle
        // key is shift-covariant). n_cross_dups counts the dropped
        // APNG legs explicitly, so a silent cross-container miss
        // fails the hash, not just the survivor count. Truncated
        // containers (every 13th: GIF cut inside its palette, APNG
        // inside acTL) drop at the decode gate; 5-frame clips (every
        // 11th) at the quality gate.
        import graft.operators.{Multimodal, PixelDecode}
        val kernel = udf((clip: Long, g: Long, leg: Int) => {
          val bright = leg * 25
          val nc = if (clip % 11 == 0) 5 else 12
          val frames: Seq[Array[Int]] =
            (0 until leg).map(_ => Array.fill(72)(bright)) ++
              (0 until nc).map { c =>
                val gray = new Array[Int](72)
                md5Fill(gray, blk => s"an$g:$c:$blk")
                gray.map(_ % 200 + bright)
              }
          val media =
            if (leg == 0) PixelDecode.encodeGifGrayAnimated(9, 8, frames)
            else PixelDecode.encodeApngGray(9, 8, frames)
          if (clip % 13 == 0) media.take(if (leg == 0) 40 else 50)
          else media
        })
        val clips = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 7 === 3)
          .select(col("doc_id").as("clip"), col("source"))
          .withColumn("g", expr("clip - clip % 14"))
          .withColumn("leg", expr("cast((clip % 14) div 7 as int)"))
        val sh = Multimodal.animShingles(
            clips.withColumn("media",
              kernel(col("clip"), col("g"), col("leg"))), "media")
          .localCheckpoint(eager = false)
        val perClip = sh.groupBy("clip", "source")
          .agg(count(lit(1)).as("n_sh"),
            sum(col("sid") % 1000000007L).as("fp"))
          .localCheckpoint(eager = false)
        val qual = perClip.where(col("n_sh") >= 6)
        val qsh = sh.join(qual.select("clip"), Seq("clip"))
        import graft.operators.CorpusFunnel
        import graft.operators.CorpusFunnel.{AggStage, CountStage}
        val dup = CorpusFunnel.alignedDupIds(qsh, "clip", "t", "sid", 6)
        val kept = CorpusFunnel.survivors(qual, dup, "clip")
        // sparse: a source could in principle carry zero cross-dups
        // (boundary groups split across sources) — count 0, not a
        // dropped row
        CorpusFunnel.stageCounts("source", Seq(
          CountStage("n_raw", clips),
          CountStage("n_decoded", perClip),
          CountStage("n_quality", qual),
          AggStage(dup
            .join(clips.select("clip", "source", "leg"), Seq("clip"))
            .groupBy("source")
            .agg(sum(when(col("leg") === 1, 1L).otherwise(0L))
              .as("n_cross_dups")),
            Seq("n_cross_dups")),
          AggStage(kept.groupBy("source")
            .agg(count(lit(1)).as("n_unique"),
              (sum("fp") % 1000000007L).as("kept_fp")),
            Seq("n_unique", "kept_fp"))), sparse = true)
      },
      Some("""WITH cl AS (SELECT doc_id AS clip, source,
            doc_id - doc_id % 14 AS g,
            ((doc_id % 14) // 7)::BIGINT AS leg,
            (doc_id % 13 = 0) AS corrupt,
            CASE WHEN doc_id % 11 = 0 THEN 5 ELSE 12 END AS nc
          FROM documents WHERE doc_id % 7 = 3),
        live AS (SELECT * FROM cl WHERE NOT corrupt),
        cpx AS (SELECT clip, tc + leg AS t, (i // 9) AS r,
            (i % 9) AS c,
            (('0x' || substr(md5('an' || g::VARCHAR || ':' ||
                tc::VARCHAR || ':' || (i // 16)::VARCHAR),
              (i % 16) * 2 + 1, 2))::BIGINT % 200 + leg * 25) AS gpx
          FROM live, (SELECT unnest(range(12)) AS tc) ts,
            (SELECT unnest(range(72)) AS i) ii
          WHERE tc < nc),
        fh AS (
          SELECT a.clip, a.t,
            sum(CASE WHEN a.gpx > b.gpx AND a.r * 8 + a.c < 32
              THEN (1::BIGINT << (a.r * 8 + a.c)) ELSE 0 END)::BIGINT AS dlo,
            sum(CASE WHEN a.gpx > b.gpx AND a.r * 8 + a.c >= 32
              THEN (1::BIGINT << (a.r * 8 + a.c - 32))
              ELSE 0 END)::BIGINT AS dhi
          FROM cpx a JOIN cpx b ON b.clip = a.clip AND b.t = a.t
            AND b.r = a.r AND b.c = a.c + 1
          WHERE a.c < 8 GROUP BY 1, 2
          UNION ALL
          SELECT clip, li AS t, 0::BIGINT, 0::BIGINT
          FROM live, (SELECT unnest(range(1)) AS li) ls
          WHERE li < leg),
        fk AS (SELECT clip, t, (dlo * 31 + dhi) % 1048573 AS fk FROM fh),
        sh AS (SELECT a.clip, a.t,
            (a.fk * 1048573 + b.fk) * 1048573 + c.fk AS sid
          FROM fk a JOIN fk b ON b.clip = a.clip AND b.t = a.t + 1
            JOIN fk c ON c.clip = a.clip AND c.t = a.t + 2),
        pc AS (SELECT clip, count(*)::BIGINT AS n_sh,
            sum(sid % 1000000007)::BIGINT AS fp
          FROM sh GROUP BY 1),
        qual AS (SELECT clip, fp FROM pc WHERE n_sh >= 6),
        qsh AS (SELECT sh.* FROM sh JOIN qual USING (clip)),
        aligned AS (SELECT a.clip AS ca, b.clip AS cb, b.t - a.t AS dt,
            count(*)::BIGINT AS n_al
          FROM qsh a JOIN qsh b ON a.sid = b.sid AND a.clip < b.clip
          GROUP BY 1, 2, 3),
        dup AS (SELECT DISTINCT cb AS clip FROM aligned
          WHERE n_al >= 6),
        kept AS (SELECT q.clip, q.fp FROM qual q
          LEFT JOIN dup d ON d.clip = q.clip WHERE d.clip IS NULL)
        SELECT r.source, r.n_raw,
          COALESCE(dc.n_decoded, 0) AS n_decoded,
          COALESCE(qq.n_quality, 0) AS n_quality,
          COALESCE(xd.n_cross_dups, 0) AS n_cross_dups,
          COALESCE(k.n_unique, 0) AS n_unique,
          COALESCE(k.kept_fp, 0) AS kept_fp
        FROM (SELECT source, count(*)::BIGINT AS n_raw
            FROM cl GROUP BY 1) r
        LEFT JOIN (SELECT source, count(*)::BIGINT AS n_decoded
            FROM live GROUP BY 1) dc USING (source)
        LEFT JOIN (SELECT cl.source, count(*)::BIGINT AS n_quality
            FROM qual JOIN cl USING (clip) GROUP BY 1) qq
          USING (source)
        LEFT JOIN (SELECT cl.source,
            sum(CASE WHEN cl.leg = 1 THEN 1 ELSE 0 END)::BIGINT
              AS n_cross_dups
            FROM dup JOIN cl USING (clip) GROUP BY 1) xd
          USING (source)
        LEFT JOIN (SELECT cl.source, count(*)::BIGINT AS n_unique,
            (sum(kept.fp) % 1000000007)::BIGINT AS kept_fp
            FROM kept JOIN cl USING (clip) GROUP BY 1) k
          USING (source)
        ORDER BY source"""),
      "Cross-container animation dedup: the same content as GIF and " +
        "as APNG (shifted + brightness-re-graded) must near-dup in " +
        "ONE funnel through the container-dispatching shingle kernel " +
        "— n_cross_dups pins the dropped APNG legs explicitly, and " +
        "the oracle replays pixels/dHash/shingles for both " +
        "containers."),

    GraftQuery(
      "q_pipeline_wavcodec", Seq("S8", "D1", "J11", "D9"),
      (s, dir) => {
        // The UNIFIED WAV decode gate, oracle-proven: each content
        // group ships FOUR containers — a µ-law-representable stream
        // as plain PCM16 (leg 0) and as a G.711 µ-law WAV (leg 1),
        // and a closed-loop IMA-ADPCM stream (nibbles tracking an md5
        // white-noise target) as PCM16 (leg 2) and as the ADPCM block
        // (leg 3) — ALL decoded through the one AudioCodecs.samples
        // entry point. Compressed legs decode to the EXACT stream
        // their PCM16 twin carries, so the landmark near-dup must
        // drop each codec leg against its twin (n_codec_dups pins
        // that explicitly). The oracle replays µ-law through the
        // published 256-entry table as VALUES and the full ADPCM
        // encoder+decoder through the published step tables as a
        // RECURSIVE state machine — a threshold-cascade, clamp, or
        // index-adaptation slip anywhere in the distributed codec
        // changes the landmark hash. Truncated containers (every
        // 13th) drop at the decode gate; 256-sample clips (every
        // 11th) at the duration gate.
        import graft.operators.{AudioCodecs, AudioFingerprint,
          AudioHeader}
        val kernel = udf((clip: Long, g: Long, leg: Int) => {
          val nc = if (clip % 11 == 0) 256 else 768
          val md = java.security.MessageDigest.getInstance("MD5")
          val wav0: Array[Byte] = leg match {
            case 0 | 1 =>
              val codes = (0 until nc / 16).flatMap(k =>
                md.digest(s"wc$g:$k".getBytes("US-ASCII"))).toArray
              if (leg == 1)
                AudioCodecs.synthesizeWavG711Codes(8000, codes, "ulaw")
              else AudioHeader.synthesizeWavPcm16(8000,
                codes.map(c => AudioCodecs.muLawDecode(c & 0xff)))
            case _ =>
              // closed-loop ADPCM of an md5 white-noise target —
              // raw random nibbles would decode to a random WALK
              // (1/f^2 spectrum, every frame peaking at bin 1),
              // collapsing landmark diversity; tracking a white
              // target keeps the decoded spectrum diverse AND makes
              // the oracle replay the full encoder+decoder state
              // machine
              val target = Array.tabulate(nc) { j =>
                val d = md.digest(s"wt$g:${j / 8}".getBytes("US-ASCII"))
                ((d(2 * (j % 8)) & 0xff) << 8 |
                  (d(2 * (j % 8) + 1) & 0xff)) - 32768
              }
              val seed = (g % 2000 - 1000).toInt
              val data = new Array[Byte](nc / 2)
              var pred = seed
              var idx = 0
              var j = 0
              while (j < nc) {
                val (n1, p1, i1) =
                  AudioCodecs.imaEncodeStep(target(j), pred, idx)
                val (n2, p2, i2) =
                  AudioCodecs.imaEncodeStep(target(j + 1), p1, i1)
                data(j / 2) = ((n2 << 4) | n1).toByte
                pred = p2
                idx = i2
                j += 2
              }
              val adpcm = AudioCodecs.synthesizeWavImaAdpcmCodes(
                8000, seed, 0, data)
              if (leg == 3) adpcm
              else AudioHeader.synthesizeWavPcm16(8000,
                AudioCodecs.samples(adpcm).get)
          }
          val wav = if (clip % 13 == 0) wav0.take(20) else wav0
          AudioCodecs.samples(wav) match {
            case Some(sm) => AudioFunnelRow(true, sm.length.toLong,
              AudioFingerprint.landmarks(sm)
                .map { case (t, lid) => t * 512 + lid }.toSeq)
            case None => AudioFunnelRow(false, 0L, Seq.empty)
          }
        })
        val clips = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 5 === 1)
          .select(col("doc_id").as("clip"), col("source"))
          .withColumn("g", expr("clip - clip % 20"))
          .withColumn("leg", expr("cast((clip % 20) div 5 as int)"))
        // fanout before the codec kernel (guide §2.6)
        val feats = Tables.fanout(clips)
          .withColumn("st", kernel(col("clip"), col("g"), col("leg")))
          .select(col("clip"), col("source"), col("leg"),
            col("st.decoded").as("decoded"),
            col("st.n_samples").as("n_samples"), col("st.lms").as("lms"))
          .localCheckpoint(eager = false)
        val live = feats.where(col("decoded"))
        val qual = live.where(col("n_samples") >= 512).localCheckpoint(eager = false)
        val lmdf = qual.select(col("clip"), explode(col("lms")).as("v"))
          .select(col("clip"), expr("v div 512").as("t"),
            expr("v % 512").as("lid"))
          .localCheckpoint(eager = false)
        import graft.operators.CorpusFunnel
        import graft.operators.CorpusFunnel.{AggStage, CountStage}
        val dup = CorpusFunnel.alignedDupIds(lmdf, "clip", "t", "lid", 8)
        val clFp = lmdf.groupBy("clip")
          .agg(sum((col("t") * 1000 + col("lid")) % 1000000007L).as("fp"))
        val kept = CorpusFunnel.survivors(qual, dup, "clip")
          .join(clFp, Seq("clip"))
        CorpusFunnel.stageCounts("source", Seq(
          CountStage("n_raw", clips),
          CountStage("n_decoded", live),
          CountStage("n_quality", qual),
          AggStage(dup
            .join(clips.select("clip", "source", "leg"), Seq("clip"))
            .groupBy("source")
            .agg(sum(when(col("leg") === 1 || col("leg") === 3, 1L)
              .otherwise(0L)).as("n_codec_dups")),
            Seq("n_codec_dups")),
          AggStage(kept.groupBy("source")
            .agg(count(lit(1)).as("n_unique"),
              (sum("fp") % 1000000007L).as("kept_fp")),
            Seq("n_unique", "kept_fp"))), sparse = true)
      },
      Some {
        import graft.operators.{AudioCodecs, AudioFingerprint}
        val trig = AudioFingerprint.trigValuesSql
        val mu = (0 until 256)
          .map(c => s"($c,${AudioCodecs.muLawDecode(c)})").mkString(",")
        val stp = AudioCodecs.ImaStep.zipWithIndex
          .map { case (v, i) => s"($i,$v)" }.mkString(",")
        val adj = AudioCodecs.ImaIndexAdjust.zipWithIndex
          .map { case (d, n) => s"($n,$d)" }.mkString(",")
        s"""WITH RECURSIVE
        tg(k, n, cq, sq) AS (SELECT * FROM (VALUES $trig) v(k, n, cq, sq)),
        g711(code, mu) AS (SELECT * FROM (VALUES $mu) v(code, mu)),
        stp(i, st) AS (SELECT * FROM (VALUES $stp) v(i, st)),
        adj(nb, d) AS (SELECT * FROM (VALUES $adj) v(nb, d)),
        cl AS (SELECT doc_id AS clip, source,
            doc_id - doc_id % 20 AS g,
            ((doc_id % 20) // 5)::INT AS leg,
            (doc_id % 13 = 0) AS corrupt,
            CASE WHEN doc_id % 11 = 0 THEN 256 ELSE 768 END AS nc
          FROM documents WHERE doc_id % 5 = 1),
        live AS (SELECT * FROM cl WHERE NOT corrupt),
        q AS (SELECT * FROM live
          WHERE (CASE WHEN leg <= 1 THEN nc ELSE nc + 1 END) >= 512),
        ga AS (SELECT DISTINCT g FROM q WHERE leg <= 1),
        sa AS (SELECT ga.g, j,
            ('0x' || substr(md5('wc' || g::VARCHAR || ':' ||
              (j // 16)::VARCHAR), (j % 16) * 2 + 1, 2))::INT AS code
          FROM ga, (SELECT unnest(range(768)) AS j)),
        gb AS (SELECT DISTINCT g, (g % 2000 - 1000)::INT AS seed
          FROM q WHERE leg >= 2),
        tgt AS (SELECT gb.g, j,
            (('0x' || substr(md5('wt' || g::VARCHAR || ':' ||
              (j // 8)::VARCHAR), (j % 8) * 4 + 1, 4))::INT
              - 32768) AS x
          FROM gb, (SELECT unnest(range(768)) AS j)),
        ad AS (
          SELECT g, -1 AS j, seed AS pred, 0 AS idx FROM gb
          UNION ALL
          SELECT g, j,
            GREATEST(-32768, LEAST(32767, pred + sgn *
              (st // 8 + b4 * st + b2 * (st // 2) + b1 * (st // 4))
              ))::INT AS pred,
            GREATEST(0, LEAST(88, idx + a.d))::INT AS idx
          FROM (
            SELECT *, CASE WHEN d - b4 * st - b2 * (st // 2)
                >= st // 4 THEN 1 ELSE 0 END AS b1
            FROM (
              SELECT *, CASE WHEN d - b4 * st >= st // 2
                  THEN 1 ELSE 0 END AS b2
              FROM (
                SELECT *, CASE WHEN d >= st THEN 1 ELSE 0 END AS b4
                FROM (
                  SELECT r.g, r.j + 1 AS j, r.pred, r.idx, s.st,
                    CASE WHEN t.x < r.pred THEN -1 ELSE 1 END AS sgn,
                    abs(t.x - r.pred) AS d
                  FROM ad r
                  JOIN stp s ON s.i = r.idx
                  JOIN tgt t ON t.g = r.g AND t.j = r.j + 1)))) enc
          JOIN adj a ON a.nb = enc.b4 * 4 + enc.b2 * 2 + enc.b1),
        svb AS (SELECT g, j + 1 AS pos, pred AS sv FROM ad),
        sm AS (
          SELECT c.clip, s.j AS pos, gm.mu::BIGINT AS sv
          FROM q c JOIN sa s ON s.g = c.g AND s.j < c.nc
          JOIN g711 gm ON gm.code = s.code
          WHERE c.leg <= 1
          UNION ALL
          SELECT c.clip, s.pos, s.sv::BIGINT AS sv
          FROM q c JOIN svb s ON s.g = c.g AND s.pos < c.nc
          WHERE c.leg >= 2),
        fr AS (SELECT clip, pos // 16 AS t, pos % 16 AS nn, sv FROM sm),
        sp AS (SELECT f.clip, f.t, tg.k,
            sum(f.sv * tg.cq)::BIGINT AS re,
            sum(f.sv * tg.sq)::BIGINT AS im
          FROM fr f JOIN tg ON tg.n = f.nn GROUP BY 1, 2, 3),
        pk AS (SELECT clip, t, k,
            row_number() OVER (PARTITION BY clip, t
              ORDER BY re * re + im * im DESC, k ASC) AS rn
          FROM sp),
        peaks AS (SELECT clip, t, k FROM pk WHERE rn = 1),
        lm AS (SELECT a.clip, a.t,
            (a.k - 1) * 64 + (b.k - 1) * 8 + (c.k - 1) AS lid
          FROM peaks a
          JOIN peaks b ON b.clip = a.clip AND b.t = a.t + 1
          JOIN peaks c ON c.clip = a.clip AND c.t = a.t + 2),
        aligned AS (SELECT a.clip AS ca, b.clip AS cb, b.t - a.t AS dt,
            count(*)::BIGINT AS n_al
          FROM lm a JOIN lm b ON a.lid = b.lid AND a.clip < b.clip
          GROUP BY 1, 2, 3),
        dup AS (SELECT DISTINCT cb AS clip FROM aligned
          WHERE n_al >= 8),
        clfp AS (SELECT clip,
            sum((t * 1000 + lid) % 1000000007)::BIGINT AS fp
          FROM lm GROUP BY 1),
        kept AS (SELECT q.clip, clfp.fp FROM q
          JOIN clfp ON clfp.clip = q.clip
          LEFT JOIN dup d ON d.clip = q.clip WHERE d.clip IS NULL)
        SELECT r.source, r.n_raw,
          COALESCE(dc.n_decoded, 0) AS n_decoded,
          COALESCE(qq.n_quality, 0) AS n_quality,
          COALESCE(xd.n_codec_dups, 0) AS n_codec_dups,
          COALESCE(k.n_unique, 0) AS n_unique,
          COALESCE(k.kept_fp, 0) AS kept_fp
        FROM (SELECT source, count(*)::BIGINT AS n_raw
            FROM cl GROUP BY 1) r
        LEFT JOIN (SELECT source, count(*)::BIGINT AS n_decoded
            FROM live GROUP BY 1) dc USING (source)
        LEFT JOIN (SELECT source, count(*)::BIGINT AS n_quality
            FROM q GROUP BY 1) qq USING (source)
        LEFT JOIN (SELECT cl.source,
            sum(CASE WHEN cl.leg IN (1, 3) THEN 1 ELSE 0 END)::BIGINT
              AS n_codec_dups
            FROM dup JOIN cl USING (clip) GROUP BY 1) xd
          USING (source)
        LEFT JOIN (SELECT cl.source, count(*)::BIGINT AS n_unique,
            (sum(kept.fp) % 1000000007)::BIGINT AS kept_fp
            FROM kept JOIN cl USING (clip) GROUP BY 1) k
          USING (source)
        ORDER BY source"""
      },
      "The unified WAV decode gate: G.711 u-law and closed-loop " +
        "IMA-ADPCM blocks decode through the one AudioCodecs.samples " +
        "dispatch to the EXACT streams their PCM16 twins carry and " +
        "must near-dup against them (n_codec_dups pins it) — the " +
        "oracle replays u-law via the published table as VALUES and " +
        "the full ADPCM encoder+decoder as a RECURSIVE CTE over the " +
        "published step tables."),

    GraftQuery(
      "q_multimodal_id3", Seq("S8", "P6", "A8"),
      (s, dir) => {
        // ID3v2 text frames -> the text pipeline (the MP3 twin of
        // mp4Cues' caption bridge): per doc an MP3 whose ID3v2 tag
        // (v2.3 for even docs, v2.4 syncsafe for odd) carries
        // title/artist(/album on every 3rd) frames with id-derived
        // text; every 13th doc's tag magic is corrupted (no tag ->
        // no frames). The distributed walk explodes (frame_id, text)
        // rows; the oracle REBUILDS the expected strings from the
        // same arithmetic — a size-field slip or charset mangle
        // changes sum_len/min_text and fails the hash. Stateless
        // per-row projection; one (source, frame_id) rollup shuffle.
        import graft.operators.AudioHeader
        val extract = udf((docId: Long) => {
          val frames = Seq(
            "TIT2" -> s"title $docId",
            "TPE1" -> s"artist ${docId % 50}") ++
            (if (docId % 3 == 0) Seq("TALB" -> s"album ${docId % 10}")
             else Nil)
          val tag = AudioHeader.synthesizeId3v2(frames,
            major = if (docId % 2 == 0) 3 else 4)
          if (docId % 13 == 0) tag(0) = 'X'.toByte
          val mp3 = tag ++ AudioHeader.synthesizeMp3(mpeg1 = true,
            brIdx = 9, srIdx = 0, mono = true, nFrames = 2)
          AudioHeader.id3TextFrames(mp3)
        })
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 7 === 3)
          .select(col("doc_id"), col("source"))
          .withColumn("f", explode(extract(col("doc_id"))))
          .select(col("source"), col("f._1").as("frame_id"),
            col("f._2").as("text"))
          .groupBy("source", "frame_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(length(col("text"))).as("sum_len"),
            min(col("text")).as("min_text"))
          .orderBy("source", "frame_id")
      },
      Some("""WITH d AS (SELECT doc_id, source FROM documents
          WHERE doc_id % 7 = 3 AND doc_id % 13 != 0),
        fr AS (
          SELECT doc_id, source, 'TIT2' AS frame_id,
            'title ' || doc_id::VARCHAR AS text FROM d
          UNION ALL
          SELECT doc_id, source, 'TPE1',
            'artist ' || (doc_id % 50)::VARCHAR FROM d
          UNION ALL
          SELECT doc_id, source, 'TALB',
            'album ' || (doc_id % 10)::VARCHAR FROM d
          WHERE doc_id % 3 = 0)
        SELECT source, frame_id, count(*)::BIGINT AS n_frames,
          sum(length(text))::BIGINT AS sum_len,
          min(text) AS min_text
        FROM fr GROUP BY 1, 2 ORDER BY 1, 2"""),
      "ID3v2 text frames extracted from MP3 tags (v2.3 plain and " +
        "v2.4 syncsafe sizes) into text rows — the oracle rebuilds " +
        "the expected strings from the id arithmetic, pinning the " +
        "frame walk, size decoding, and charset handling; corrupted " +
        "tag magic yields no frames."),

    GraftQuery(
      "q_multimodal_apic", Seq("S8", "P6", "A8"),
      (s, dir) => {
        // ID3v2 APIC album art -> the IMAGE pipeline (the MP3 twin of
        // mp4Cues' caption bridge, completing the cross-modal bridge
        // matrix): per doc an MP3 whose tag (v2.3 even docs, v2.4
        // odd) carries a 32x32 PNG cover; every 3 docs share one
        // cover under per-doc brightness re-grades (+0/+20/+40 —
        // pHash is DC-invariant, so the three must hash IDENTICALLY
        // despite different bytes: n_covers counts the distinct
        // hashes); every 13th doc's PNG is truncated (APIC parses,
        // pixels don't — the decode gate). The oracle replays the
        // pixel -> DCT -> median -> pHash math per doc from the md5
        // arithmetic, so a mime/description offset slip in the APIC
        // walk or any pixel slip fails cover_fp. Stateless per-row
        // projection; one (source) rollup shuffle.
        import graft.operators.{AudioHeader, Multimodal, PixelDecode}
        val mkMp3 = udf((docId: Long, ag: Long, b: Int) => {
          val gray = new Array[Int](1024)
          md5Fill(gray, blk => s"ap$ag:$blk")
          val art = gray.map(_ % 200 + b * 20)
          val png0 = PixelDecode.encodePngGray(32, 32, art)
          val png = if (docId % 13 == 0) png0.take(30) else png0
          AudioHeader.synthesizeId3v2(
            Seq("TIT2" -> s"t $docId"),
            major = if (docId % 2 == 0) 3 else 4,
            apic = Seq(("image/png", 3, png))) ++
            AudioHeader.synthesizeMp3(mpeg1 = false, brIdx = 2,
              srIdx = 0, mono = true, nFrames = 2)
        })
        val arts = Multimodal.id3CoverArt(
          Tables.load(s, dir, "documents")
            .where(col("doc_id") % 9 === 5)
            .select(col("doc_id"), col("source"))
            .withColumn("ag", expr("doc_id - doc_id % 27"))
            .withColumn("b", expr("cast((doc_id % 27) div 9 as int)"))
            .withColumn("media",
              mkMp3(col("doc_id"), col("ag"), col("b"))), "media")
        arts
          .withColumn("mf", Multimodal.featuresColumn(col("art")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_art"),
            sum(when(col("mime") === "image/png" &&
              col("pic_type") === 3, 1L).otherwise(0L)).as("n_png"),
            sum(when(col("mf.decoded"), 1L).otherwise(0L))
              .as("n_decoded"),
            countDistinct(when(col("mf.decoded"), col("mf.phash")))
              .as("n_covers"),
            coalesce(sum(when(col("mf.decoded"),
              col("mf.phash") % 1000000007L)), lit(0L)).as("cover_fp"))
          .orderBy("source")
      },
      Some {
        val ctvals = (for (u <- 0 until 8; x <- 0 until 32)
          yield s"($u,$x,${graft.operators.PixelDecode.DctCos(u)(x)})")
          .mkString(",")
        s"""WITH ct(u, x, cv) AS (SELECT * FROM (VALUES $ctvals) v(u, x, cv)),
        d AS (SELECT doc_id, source,
            doc_id - doc_id % 27 AS ag,
            ((doc_id % 27) // 9)::BIGINT AS b,
            (doc_id % 13 = 0) AS corrupt
          FROM documents WHERE doc_id % 9 = 5),
        live AS (SELECT * FROM d WHERE NOT corrupt),
        px AS (SELECT doc_id, (i // 32) AS r, (i % 32) AS c,
            (('0x' || substr(md5('ap' || ag::VARCHAR || ':' ||
              (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT
              % 200 + b * 20) AS g
          FROM live, (SELECT unnest(range(1024)) AS i)),
        t1 AS (SELECT px.doc_id, ct.u, px.c AS y,
            sum(px.g * ct.cv)::BIGINT AS t
          FROM px JOIN ct ON ct.x = px.r GROUP BY 1, 2, 3),
        co AS (SELECT t1.doc_id, t1.u, ct.u AS v,
            sum(t1.t * ct.cv)::BIGINT AS coef
          FROM t1 JOIN ct ON ct.x = t1.y GROUP BY 1, 2, 3),
        acs AS (SELECT doc_id, u, v, coef,
            row_number() OVER (PARTITION BY doc_id ORDER BY coef) AS rn
          FROM co WHERE NOT (u = 0 AND v = 0)),
        med AS (SELECT doc_id, coef AS med FROM acs WHERE rn = 32),
        ph AS (SELECT a.doc_id, sum(CASE WHEN a.coef > m.med
            THEN (1::BIGINT << (a.u * 8 + a.v - 1))
            ELSE 0 END)::BIGINT AS phash
          FROM acs a JOIN med m USING (doc_id) GROUP BY 1)
        SELECT d.source, count(*)::BIGINT AS n_art,
          count(*)::BIGINT AS n_png,
          sum(CASE WHEN NOT d.corrupt THEN 1 ELSE 0 END)::BIGINT
            AS n_decoded,
          count(DISTINCT ph.phash)::BIGINT AS n_covers,
          COALESCE(sum(ph.phash % 1000000007), 0)::BIGINT AS cover_fp
        FROM d LEFT JOIN ph USING (doc_id)
        GROUP BY 1 ORDER BY 1"""
      },
      "ID3v2 APIC album art into the image pipeline: covers shared " +
        "across MP3s under brightness re-grades must pHash " +
        "identically (DC invariance), truncated PNGs drop at the " +
        "decode gate — the oracle replays the APIC walk implicitly " +
        "and the pixel/DCT/median/pHash math explicitly from the md5 " +
        "arithmetic."),

    GraftQuery(
      "q_multimodal_oggmd", Seq("S8", "P6", "A8"),
      (s, dir) => {
        // Ogg container metadata (RFC 3533 page walk + Opus/Vorbis id
        // headers, per-page CRC verified): per doc a real Ogg stream
        // — Opus for even docs (pre-skip-adjusted 48 kHz duration),
        // Vorbis for odd (rate-based duration) — with id-derived page
        // counts and granules; every 13th doc truncated mid-page (the
        // CRC/bounds gate -> parse None, counted as undecoded). The
        // oracle replays the granule arithmetic and both duration
        // formulas relationally. Stateless per-row walk; one
        // (source, codec) rollup shuffle.
        import graft.operators.OggHeader
        val kernel = udf((docId: Long) => {
          val nAud = (3 + docId % 4).toInt
          val ogg =
            if (docId % 2 == 0)
              OggHeader.synthesizeOggOpus(
                1 + (docId % 2).toInt, (docId % 5).toInt * 100, 48000,
                (1 to nAud).map(_ * 960L))
            else {
              val rate = 8000 + (docId % 4).toInt * 1000
              OggHeader.synthesizeOggVorbis(
                1 + (docId % 3).toInt, rate,
                (1 to nAud).map(_ * (rate / 10).toLong))
            }
          val blob = if (docId % 13 == 0) ogg.take(40) else ogg
          OggHeader.parse(blob) match {
            case Some(i) => (i.codec, i.channels, i.sampleRate,
              i.durationMs, i.lastGranule, i.nPages)
            case None => ("none", 0, 0, 0L, 0L, 0)
          }
        })
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 7 === 5)
          .select(col("doc_id"), col("source"))
          .withColumn("st", kernel(col("doc_id")))
          .groupBy(col("source"), col("st._1").as("codec"))
          .agg(count(lit(1)).as("n_clips"),
            sum(col("st._2")).as("ch_sum"),
            sum(col("st._4")).as("dur_sum"),
            sum(col("st._5") % 1000000007L).as("granule_fp"),
            sum(col("st._6")).as("pages_sum"))
          .orderBy("source", "codec")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (3 + doc_id % 4)::BIGINT AS naud,
            (doc_id % 13 = 0) AS corrupt
          FROM documents WHERE doc_id % 7 = 5),
        st AS (SELECT doc_id, source,
            CASE WHEN corrupt THEN 'none'
                 WHEN doc_id % 2 = 0 THEN 'opus' ELSE 'vorbis' END AS codec,
            CASE WHEN corrupt THEN 0
                 WHEN doc_id % 2 = 0 THEN 1 + doc_id % 2
                 ELSE 1 + doc_id % 3 END AS ch,
            CASE WHEN corrupt THEN 0
                 WHEN doc_id % 2 = 0 THEN greatest(
                   naud * 960 - (doc_id % 5) * 100, 0) * 1000 // 48000
                 ELSE naud * 100 END AS dur,
            CASE WHEN corrupt THEN 0
                 WHEN doc_id % 2 = 0 THEN naud * 960
                 ELSE naud * ((8000 + (doc_id % 4) * 1000) // 10)
                 END AS granule,
            CASE WHEN corrupt THEN 0
                 WHEN doc_id % 2 = 0 THEN naud + 2
                 ELSE naud + 1 END AS pages
          FROM d)
        SELECT source, codec, count(*)::BIGINT AS n_clips,
          sum(ch)::BIGINT AS ch_sum, sum(dur)::BIGINT AS dur_sum,
          sum(granule % 1000000007)::BIGINT AS granule_fp,
          sum(pages)::BIGINT AS pages_sum
        FROM st GROUP BY 1, 2 ORDER BY 1, 2"""),
      "Ogg Opus/Vorbis container metadata through the CRC-verified " +
        "page walk — terminal granules, pre-skip/rate duration " +
        "formulas, and page counts replayed relationally; truncated " +
        "streams fail the parse and roll up as undecoded."),

    GraftQuery(
      "q_multimodal_audiomd", Seq("S8", "P6", "A8"),
      (s, dir) => {
        // Compressed-audio CONTAINER metadata — the audio twin of the
        // TIFF/EXIF and ISO-BMFF walks, extending S8 beyond WAV: even
        // docs carry a byte-built MP3 (ID3v2 prefix on every 5th,
        // Layer III frames whose lengths exercise the padding-bit
        // arithmetic, both MPEG versions), odd docs a FLAC STREAMINFO
        // (+ padding block on two of three). The PRODUCTION parsers
        // walk them back — parseMp3 walks EVERY frame header, so the
        // frame count/duration pin the 144000*kbps/rate+pad length
        // math; parseFlac pins the 20-bit rate / 36-bit total field
        // extraction. The oracle replays all fields from the id
        // arithmetic with the bitrate/rate tables inlined as VALUES.
        // Scale shape: one blob per row, embarrassingly parallel; the
        // only shuffle is the (source, fmt) rollup.
        import graft.operators.AudioHeader
        val kernel = udf((docId: Long) => {
          if (docId % 2 == 0) {
            val i = AudioHeader.parseMp3(AudioHeader.synthesizeMp3(
              mpeg1 = docId % 4 == 0,
              brIdx = 1 + (docId % 14).toInt,
              srIdx = (docId % 3).toInt,
              mono = docId % 3 == 0,
              nFrames = 3 + (docId % 5).toInt,
              id3Size = if (docId % 5 == 0) 40 + (docId % 7).toInt
                else 0)).get
            AudioMdRow("mp3", i.bitrateKbps, i.sampleRate, i.channels,
              i.nFrames, i.nSamples, i.durationMs)
          } else {
            val i = AudioHeader.parseFlac(AudioHeader.synthesizeFlac(
              sampleRate = 8000 * (1 + (docId % 5).toInt),
              channels = 1 + ((docId / 3) % 2).toInt,
              bitsPerSample = 16,
              totalSamples = 10000L + (docId * 7) % 50000,
              padLen = ((docId % 3) * 8).toInt)).get
            AudioMdRow("flac", i.bitsPerSample, i.sampleRate,
              i.channels, 0, i.totalSamples, i.durationMs)
          }
        })
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .withColumn("md", kernel(col("doc_id")))
          .groupBy(col("source"), col("md.fmt").as("fmt"))
          .agg(count(lit(1)).as("n"),
            sum(col("md.rate_kbps").cast("long")).as("kbps_sum"),
            sum(col("md.sample_rate").cast("long")).as("rate_sum"),
            sum(col("md.channels").cast("long")).as("ch_sum"),
            sum(col("md.n_frames").cast("long")).as("frames_sum"),
            sum(col("md.n_samples")).as("samples_sum"),
            sum(col("md.duration_ms")).as("dur_sum"))
          .orderBy("source", "fmt")
      },
      Some {
        val br = (1 to 14).map(i =>
          s"($i,${graft.operators.AudioHeader.Mp3BitrateV1L3(i)}," +
            s"${graft.operators.AudioHeader.Mp3BitrateV2L3(i)})")
          .mkString(",")
        val sr = (0 to 2).map(i =>
          s"($i,${graft.operators.AudioHeader.Mp3RateV1(i)}," +
            s"${graft.operators.AudioHeader.Mp3RateV2(i)})")
          .mkString(",")
        s"""WITH br(i, v1, v2) AS (SELECT * FROM (VALUES $br) b(i, v1, v2)),
        sr(i, r1, r2) AS (SELECT * FROM (VALUES $sr) r(i, r1, r2)),
        mp3 AS (SELECT d.doc_id, d.source,
            CASE WHEN d.doc_id % 4 = 0 THEN br.v1 ELSE br.v2 END AS kbps,
            CASE WHEN d.doc_id % 4 = 0 THEN sr.r1 ELSE sr.r2 END AS rate,
            CASE WHEN d.doc_id % 3 = 0 THEN 1 ELSE 2 END AS ch,
            (3 + d.doc_id % 5)::BIGINT AS nf,
            CASE WHEN d.doc_id % 4 = 0 THEN 1152 ELSE 576 END AS spf
          FROM documents d
          JOIN br ON br.i = 1 + d.doc_id % 14
          JOIN sr ON sr.i = d.doc_id % 3
          WHERE d.doc_id % 2 = 0),
        flac AS (SELECT doc_id, source,
            (8000 * (1 + doc_id % 5))::BIGINT AS rate,
            (1 + (doc_id // 3) % 2)::BIGINT AS ch,
            (10000 + (doc_id * 7) % 50000)::BIGINT AS total
          FROM documents WHERE doc_id % 2 = 1),
        rows_all AS (
          SELECT source, 'mp3' AS fmt, kbps::BIGINT AS kbps,
            rate::BIGINT AS rate, ch::BIGINT AS ch, nf AS frames,
            (nf * spf)::BIGINT AS samples,
            (nf * spf * 1000 // rate)::BIGINT AS dur
          FROM mp3
          UNION ALL
          SELECT source, 'flac', 16::BIGINT, rate, ch, 0::BIGINT,
            total, (total * 1000 // rate)::BIGINT
          FROM flac)
        SELECT source, fmt, count(*)::BIGINT AS n,
          sum(kbps)::BIGINT AS kbps_sum, sum(rate)::BIGINT AS rate_sum,
          sum(ch)::BIGINT AS ch_sum, sum(frames)::BIGINT AS frames_sum,
          sum(samples)::BIGINT AS samples_sum,
          sum(dur)::BIGINT AS dur_sum
        FROM rows_all GROUP BY 1, 2 ORDER BY 1, 2"""
      },
      "Compressed-audio container metadata: byte-built MP3s (ID3v2 " +
        "prefixes, both MPEG versions, padding-bit frame lengths) and " +
        "FLAC STREAMINFO blocks re-parsed by the production walks — " +
        "frame counts, durations, and every field replayed from id " +
        "arithmetic with the bitrate/rate tables inlined as VALUES."),

    GraftQuery(
      "q_multimodal_mp4sync", Seq("P6", "A8", "D9"),
      (s, dir) => {
        // Container-true KEYFRAME sampling — what a video pipeline
        // decodes at 100 TB (only the stss-marked I-frames), through
        // REAL sync-sample and composition-offset tables: per doc an
        // MP4 is byte-built with every 3rd sample sync and a
        // b-frame-ish ctts pattern ({-50, 0, +50} reordering), then
        // the PRODUCTION Multimodal.mp4KeyframeSample walks it back —
        // exactly the sync frames, each with dts AND pts. The oracle
        // replays indices, both clocks, and the payload bytes from
        // the id arithmetic, pinning stss membership and the signed
        // ctts offset resolution. Scale shape: one blob per row; the
        // only shuffle is the source rollup.
        import graft.operators.{Multimodal, VideoHeader}
        val mkMp4 = udf((docId: Long) => {
          val n = (6 + docId % 7).toInt
          val md = java.security.MessageDigest.getInstance("MD5")
          val samples = (0 until n).map { i =>
            val len = (8 + (docId + i) % 9).toInt
            md.digest(s"$docId:k$i".getBytes("US-ASCII")).take(len)
          }
          VideoHeader.synthesizeMp4WithSamples(
            "mp42", 600, n * 100L,
            VideoHeader.TrackSpec("vide", "avc1", 320, 240, 600,
              n * 100L),
            samples, 100, samplesPerChunk = 4,
            syncSamples = (1 to n by 3),
            cttsOffsets = (0 until n).map(i =>
              ((docId + i) % 3) * 50 - 50))
        })
        val byteSum = udf((b: Array[Byte]) =>
          b.map(x => (x & 0xff).toLong).sum)
        val vids = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("source"))
          .withColumn("media", mkMp4(col("doc_id")))
        Multimodal.mp4KeyframeSample(vids, "media")
          .withColumn("bsum", byteSum(col("frame")))
          .groupBy("source")
          .agg(countDistinct("doc_id").as("n_videos"),
            count(lit(1)).as("n_keyframes"),
            sum("dts").as("sum_dts"),
            sum("pts").as("sum_pts"),
            sum(octet_length(col("frame")).cast("long")).as("sum_bytes"),
            sum(col("bsum") % 1000000007L).as("byte_fp"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (6 + doc_id % 7)::BIGINT AS n
          FROM documents WHERE doc_id % 2 = 0),
        fr AS (SELECT doc_id, source, i,
            (8 + (doc_id + i) % 9)::BIGINT AS sz,
            i * 100 AS dts,
            i * 100 + ((doc_id + i) % 3) * 50 - 50 AS pts
          FROM (SELECT d.*, unnest(range(n)) AS i FROM d)
          WHERE i % 3 = 0),
        by AS (SELECT fr.doc_id, fr.source, fr.i,
            ('0x' || substr(md5(fr.doc_id::VARCHAR || ':k' ||
              fr.i::VARCHAR), j * 2 + 1, 2))::BIGINT AS b
          FROM fr, (SELECT unnest(range(16)) AS j) js
          WHERE js.j < fr.sz),
        fsum AS (SELECT doc_id, source, i, sum(b)::BIGINT AS bsum
          FROM by GROUP BY 1, 2, 3)
        SELECT fr.source, count(DISTINCT fr.doc_id)::BIGINT AS n_videos,
          count(*)::BIGINT AS n_keyframes,
          sum(fr.dts)::BIGINT AS sum_dts,
          sum(fr.pts)::BIGINT AS sum_pts,
          sum(fr.sz)::BIGINT AS sum_bytes,
          sum(fsum.bsum % 1000000007)::BIGINT AS byte_fp
        FROM fr JOIN fsum ON fsum.doc_id = fr.doc_id AND fsum.i = fr.i
        GROUP BY 1 ORDER BY 1"""),
      "Container-true keyframe sampling: real stss sync tables and " +
        "signed ctts composition offsets written and walked back by " +
        "the production operator — exactly the I-frames extracted, " +
        "dts and pts both replayed from id arithmetic."),

    GraftQuery(
      "q_multimodal_thumbnail", Seq("P6", "D9", "A8"),
      (s, dir) => {
        // The REAL thumbnail pipeline end to end: decode (real PNG of
        // per-doc varied dimensions) -> aspect-fit plan (the
        // PRODUCTION Multimodal.withResizePlan column arithmetic,
        // maxDim 10 — images already inside the box pass through
        // unresampled) -> EXACT integer area resample
        // (PixelDecode.resizeArea, the scaled-integer box overlaps) ->
        // PNG re-encode -> decode the THUMB back and report its pixel
        // stats, so the emitted numbers prove the whole
        // decode/resample/encode chain, not just the plan. The oracle
        // replays the plan arithmetic AND the variable-geometry
        // resample relationally (per-doc w/h/tw/th in the overlap
        // join). Scale shape: per-row kernels over the pruned scan;
        // one keyed rollup.
        import graft.operators.{Multimodal, PixelDecode}
        val mkPng = udf((docId: Long) => {
          val w = 4 + (docId % 17).toInt
          val h = 3 + (docId % 11).toInt
          val gray = new Array[Int](w * h)
          md5Fill(gray, blk => s"th$docId:$blk")
          PixelDecode.encodePngGray(w, h, gray)
        })
        val thumb = udf((media: Array[Byte], tw: Int, th: Int) => {
          val px = PixelDecode.decode(media).get
          val g = PixelDecode.grayLuma(px)
          val rs = PixelDecode.resizeArea(g, px.width, px.height, tw, th)
          val png = PixelDecode.encodePngGray(tw, th, rs)
          val back = PixelDecode.grayLuma(PixelDecode.decode(png).get)
          var sum = 0L; var sq = 0L
          back.foreach { v => sum += v; sq += v.toLong * v }
          (sum, sq)
        })
        val imgs = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 3 === 0)
          .select(col("doc_id"), col("source"))
          .withColumn("media", mkPng(col("doc_id")))
        val planned = Multimodal.withResizePlan(
          Multimodal.withDecodedFeatures(imgs, "media")
            .where(col("decoded")),
          "width", "height", maxDim = 10)
        planned
          .withColumn("t",
            thumb(col("media"), col("target_w"), col("target_h")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_imgs"),
            sum(when(col("resized"), 1L).otherwise(0L)).as("n_resized"),
            sum(col("target_w").cast("long")).as("tw_sum"),
            sum(col("target_h").cast("long")).as("th_sum"),
            sum("out_pixels").as("out_px"),
            sum(col("t._1")).as("t_px_sum"),
            sum(col("t._2")).as("t_px_sumsq"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (4 + doc_id % 17)::BIGINT AS w, (3 + doc_id % 11)::BIGINT AS h
          FROM documents WHERE doc_id % 3 = 0),
        pl AS (SELECT *,
            greatest(w, h) > 10 AS resized,
            CASE WHEN greatest(w, h) <= 10 THEN w
              WHEN w >= h THEN 10
              ELSE greatest((w * 10) // h, 1) END AS tw,
            CASE WHEN greatest(w, h) <= 10 THEN h
              WHEN w >= h THEN greatest((h * 10) // w, 1)
              ELSE 10 END AS th
          FROM d),
        px AS (SELECT pl.doc_id, pl.w, pl.h, pl.tw, pl.th,
            (i // w) AS r, (i % w) AS c,
            ('0x' || substr(md5('th' || doc_id::VARCHAR || ':' ||
              (i // 16)::VARCHAR), (i % 16) * 2 + 1, 2))::BIGINT AS g
          FROM pl, (SELECT unnest(range(340)) AS i) ii
          WHERE i < w * h),
        tpx AS (SELECT px.doc_id, jj.j, ii.i,
            (sum((least((px.c + 1) * px.tw, ii.i * px.w + px.w)
                - greatest(px.c * px.tw, ii.i * px.w))
              * (least((px.r + 1) * px.th, jj.j * px.h + px.h)
                - greatest(px.r * px.th, jj.j * px.h))
              * px.g) // any_value(px.w * px.h))::BIGINT AS g
          FROM px
          JOIN (SELECT unnest(range(10)) AS j) jj
            ON jj.j < px.th AND (px.r + 1) * px.th > jj.j * px.h
              AND px.r * px.th < jj.j * px.h + px.h
          JOIN (SELECT unnest(range(10)) AS i) ii
            ON ii.i < px.tw AND (px.c + 1) * px.tw > ii.i * px.w
              AND px.c * px.tw < ii.i * px.w + px.w
          GROUP BY 1, 2, 3),
        ts AS (SELECT doc_id, sum(g)::BIGINT AS su,
            sum(g * g)::BIGINT AS sq
          FROM tpx GROUP BY 1)
        SELECT pl.source, count(*)::BIGINT AS n_imgs,
          sum(CASE WHEN pl.resized THEN 1 ELSE 0 END)::BIGINT AS n_resized,
          sum(pl.tw)::BIGINT AS tw_sum, sum(pl.th)::BIGINT AS th_sum,
          sum(pl.tw * pl.th)::BIGINT AS out_px,
          sum(ts.su)::BIGINT AS t_px_sum,
          sum(ts.sq)::BIGINT AS t_px_sumsq
        FROM pl JOIN ts USING (doc_id) GROUP BY 1 ORDER BY 1"""),
      "The real thumbnail pipeline: decode varied-dimension PNGs, " +
        "aspect-fit plan, EXACT integer area resample, PNG re-encode, " +
        "decode the thumb back — the oracle replays the plan " +
        "arithmetic and the variable-geometry resample relationally, " +
        "pinning the whole chain."),

    GraftQuery(
      "q_multimodal_subtitles", Seq("P6", "A8", "S1"),
      (s, dir) => {
        // Caption extraction from MULTI-TRACK containers — the bridge
        // from the media pipeline into the text pipeline: per doc an
        // MP4 is byte-built with a video track AND a timed-text track
        // (both with real sample tables; the shared two-pass stco
        // patch spans both), cues in the tx3g shape (16-bit BE length
        // + UTF-8, some with trailing style bytes the decoder must
        // ignore). The PRODUCTION Multimodal.mp4Cues selects the
        // 'text' track — skipping the video trak — and decodes every
        // cue; the oracle replays cue strings from id arithmetic and
        // pins them by md5-derived hash, so a one-byte decode error
        // anywhere fails the gate. Scale shape: one blob per row;
        // only the source rollup shuffles.
        import graft.operators.{Multimodal, TextOps, VideoHeader}
        val mkMp4 = udf((docId: Long) => {
          val nCues = (3 + docId % 4).toInt
          val cues: Seq[Array[Byte]] = (0 until nCues).map { i =>
            val txt = s"cue $docId w${(docId + i) % 9} t$i"
              .getBytes("UTF-8")
            val extra: Array[Byte] =
              if (i % 2 == 0) Array[Byte](1, 2, 3)
              else Array.emptyByteArray
            Array[Byte](((txt.length >> 8) & 0xff).toByte,
              (txt.length & 0xff).toByte) ++ txt ++ extra
          }
          val vframes: Seq[Array[Byte]] =
            (0 until 2).map(i => Array.fill[Byte](5)((docId + i).toByte))
          VideoHeader.synthesizeMp4Tracks("mp42", 600, nCues * 200L,
            Seq(
              VideoHeader.TrackSamples(
                VideoHeader.TrackSpec("vide", "avc1", 320, 240, 600,
                  400L), vframes, 200, 2),
              VideoHeader.TrackSamples(
                VideoHeader.TrackSpec("text", "tx3g", 0, 0, 1000,
                  nCues * 200L), cues, 200, 3)))
        })
        // fanout before the mux+demux kernel (guide §2.6)
        val vids = Tables.fanout(Tables.load(s, dir, "documents")
          .where(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("source")))
          .withColumn("media", mkMp4(col("doc_id")))
        Multimodal.mp4Cues(vids, "media")
          .groupBy("source")
          .agg(countDistinct("doc_id").as("n_videos"),
            count(lit(1)).as("n_cues"),
            sum("dts").as("sum_dts"),
            sum(expr("size(split(text, ' '))").cast("long"))
              .as("n_tokens"),
            sum(expr(TextOps.hash64("text") + " % 1000000007"))
              .as("text_fp"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (3 + doc_id % 4)::BIGINT AS n
          FROM documents WHERE doc_id % 2 = 1),
        cues AS (SELECT doc_id, source, i, i * 200 AS dts,
            'cue ' || doc_id::VARCHAR || ' w' ||
              ((doc_id + i) % 9)::VARCHAR || ' t' || i::VARCHAR AS txt
          FROM (SELECT d.*, unnest(range(n)) AS i FROM d))
        SELECT source, count(DISTINCT doc_id)::BIGINT AS n_videos,
          count(*)::BIGINT AS n_cues,
          sum(dts)::BIGINT AS sum_dts,
          sum(len(string_split(txt, ' ')))::BIGINT AS n_tokens,
          sum(('0x' || substr(md5(txt), 1, 15))::BIGINT
            % 1000000007)::BIGINT AS text_fp
        FROM cues GROUP BY 1 ORDER BY 1"""),
      "Caption extraction from multi-track MP4s: real video + timed-" +
        "text sample tables in one container, the production cue " +
        "decoder selecting the text track and parsing tx3g length-" +
        "prefixed UTF-8 (style bytes ignored) — cue strings pinned by " +
        "md5 hash against the oracle's id-arithmetic replay."),

    GraftQuery(
      "q_multimodal_mp4audio", Seq("S8", "P6", "A8"),
      (s, dir) => {
        // The 'soun' handler leg completing the track matrix
        // (vide / text / soun): per doc a TWO-track MP4 whose audio
        // track carries interleaved PCM16 chunks (twos-complement LE,
        // the sowt shape) alongside a video track; the production
        // trackSamples('soun') walk locates every chunk, the samples
        // reassemble IN SAMPLE-TABLE ORDER into the signal, and the
        // exact integer stats (n, Σ|s|-peak, Σs², clipping count —
        // the AudioHeader.Pcm16Stats conventions) are computed over
        // the reassembled stream. The oracle replays the samples from
        // id arithmetic — a chunk located at the wrong offset or out
        // of order changes Σs² and fails the hash. One blob per row;
        // only the source rollup shuffles.
        import graft.operators.{TextOps, VideoHeader}
        val mkMp4 = udf((docId: Long) => {
          val nChunks = (3 + docId % 4).toInt
          val md = java.security.MessageDigest.getInstance("MD5")
          val chunks: Seq[Array[Byte]] = (0 until nChunks).map { c =>
            // 24 PCM16 samples per chunk, md5-derived LE pairs
            val d0 = md.digest(s"au$docId:$c:0".getBytes("US-ASCII"))
            val d1 = md.digest(s"au$docId:$c:1".getBytes("US-ASCII"))
            val d2 = md.digest(s"au$docId:$c:2".getBytes("US-ASCII"))
            d0 ++ d1 ++ d2
          }
          val vframes: Seq[Array[Byte]] =
            (0 until 2).map(i => Array.fill[Byte](4)((docId + i).toByte))
          VideoHeader.synthesizeMp4Tracks("mp42", 600, nChunks * 100L,
            Seq(
              VideoHeader.TrackSamples(
                VideoHeader.TrackSpec("vide", "avc1", 64, 64, 600,
                  200L), vframes, 100, 2),
              VideoHeader.TrackSamples(
                VideoHeader.TrackSpec("soun", "sowt", 0, 0, 8000,
                  nChunks * 24L), chunks, 24, 2)))
        })
        val stats = udf((media: Array[Byte]) => {
          val b = if (media == null) Array.empty[Byte] else media
          val chunks = VideoHeader.trackSamples(b, "soun")
            .getOrElse(Seq.empty).sortBy(_.index)
          var n = 0L; var peak = 0L; var sumSq = 0L; var clip = 0L
          chunks.foreach { s =>
            var i = s.offset.toInt
            while (i + 1 < s.offset + s.size) {
              val v = ((b(i + 1) << 8) | (b(i) & 0xff)).toShort.toLong
              n += 1
              val a = math.abs(v)
              if (a > peak) peak = a
              sumSq += v * v
              if (v == 32767 || v == -32768) clip += 1
              i += 2
            }
          }
          (n, peak, sumSq, clip)
        })
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 3 === 2)
          .select(col("doc_id"), col("source"))
          .withColumn("st", stats(mkMp4(col("doc_id"))))
          .groupBy("source")
          .agg(count(lit(1)).as("n_clips"),
            sum(col("st._1")).as("n_samples"),
            sum(col("st._2")).as("peak_sum"),
            sum(col("st._3") % 1000000007L).as("sumsq_fp"),
            sum(col("st._4")).as("n_clipped"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (3 + doc_id % 4)::BIGINT AS nc
          FROM documents WHERE doc_id % 3 = 2),
        sm AS (SELECT doc_id, source, c, j,
            (('0x' || substr(md5('au' || doc_id::VARCHAR || ':' ||
                c::VARCHAR || ':' || (j // 8)::VARCHAR),
              (j % 8) * 4 + 3, 2) ||
              substr(md5('au' || doc_id::VARCHAR || ':' ||
                c::VARCHAR || ':' || (j // 8)::VARCHAR),
              (j % 8) * 4 + 1, 2))::BIGINT) AS uv
          FROM d, (SELECT unnest(range(6)) AS c) cs,
            (SELECT unnest(range(24)) AS j) js
          WHERE c < nc),
        sv AS (SELECT doc_id, source,
            CASE WHEN uv >= 32768 THEN uv - 65536 ELSE uv END AS v
          FROM sm),
        pc AS (SELECT doc_id, source, count(*)::BIGINT AS n,
            max(abs(v))::BIGINT AS peak,
            sum(v * v)::BIGINT AS sumsq,
            sum(CASE WHEN v = 32767 OR v = -32768 THEN 1
              ELSE 0 END)::BIGINT AS clip
          FROM sv GROUP BY 1, 2)
        SELECT source, count(*)::BIGINT AS n_clips,
          sum(n)::BIGINT AS n_samples,
          sum(peak)::BIGINT AS peak_sum,
          sum(sumsq % 1000000007)::BIGINT AS sumsq_fp,
          sum(clip)::BIGINT AS n_clipped
        FROM pc GROUP BY 1 ORDER BY 1"""),
      "PCM16 audio chunks extracted from a multi-track MP4's 'soun' " +
        "track and reassembled in sample-table order — exact integer " +
        "signal stats replayed by the oracle from the little-endian " +
        "byte arithmetic, pinning chunk location and ordering."),

    GraftQuery(
      "q_pipeline_wds", Seq("S1", "P6", "D9"),
      (s, dir) => {
        // WEBDATASET shards — the standard multimodal training
        // layout: each doc is one TAR shard of {key}.png + {key}.txt
        // sample pairs (gzipped for odd docs, plain for even),
        // grouped back into samples by basename stem through the
        // production Tar.webdatasetSamples walk and decoded through
        // the ONE image kernel. Every 13th shard carries a bad-
        // checksum header after its first sample: the forgiving walk
        // keeps exactly that sample (the shard gate). The oracle
        // replays the per-sample pixel SUM from the md5 arithmetic
        // and caption lengths from the id arithmetic — an octal-
        // size, checksum, 512-padding, stem-grouping, or PNG-decode
        // slip fails the hash. One shard per row (the WebDataset
        // unit of parallelism); one (source) rollup shuffle.
        import graft.operators.{Multimodal, PixelDecode, Tar}
        val mkShard = udf((docId: Long) => {
          val ns = (docId % 3 + 2).toInt
          def members(j: Int): Seq[Tar.TarEntry] = {
            val gray = new Array[Int](1024)
            md5Fill(gray, blk => s"wd$docId:$j:$blk")
            Seq(
              Tar.TarEntry(s"${docId}_$j.png",
                PixelDecode.encodePngGray(32, 32, gray)),
              Tar.TarEntry(s"${docId}_$j.txt",
                s"caption $docId:$j".getBytes("UTF-8")))
          }
          if (docId % 13 == 0)
            Tar.synthesizeTar(members(0)).dropRight(1024) ++
              Array.fill[Byte](512)(1) // bad-checksum header
          else {
            val all = (0 until ns).flatMap(members)
            if (docId % 2 == 1) Tar.synthesizeTarGz(all)
            else Tar.synthesizeTar(all)
          }
        })
        // fanout before the shard-synthesis + ustar-walk + decode
        // kernel (guide §2.6)
        Tar.webdatasetSamples(
            Tables.fanout(Tables.load(s, dir, "documents")
              .where(col("doc_id") % 7 === 0)
              .select(col("doc_id"), col("source")))
              .withColumn("shard", mkShard(col("doc_id"))), "shard")
          .withColumn("caption",
            expr("cast(element_at(members, 'txt') as string)"))
          .withColumn("mf",
            Multimodal.featuresColumn(expr("element_at(members, 'png')")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_samples"),
            sum(when(col("caption").isNotNull &&
              expr("element_at(members, 'png')").isNotNull, 1L)
              .otherwise(0L)).as("n_complete"),
            sum(when(col("mf.decoded"), 1L).otherwise(0L))
              .as("n_decoded"),
            sum(length(col("caption"))).as("sum_caption_len"),
            sum(col("mf.px_sum") % 1000000007L).as("px_fp"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            doc_id % 3 + 2 AS ns, (doc_id % 13 = 0) AS corrupt
          FROM documents WHERE doc_id % 7 = 0),
        smp AS (SELECT doc_id, source, j
          FROM d, (SELECT unnest(range(5)) AS j)
          WHERE (corrupt AND j = 0) OR (NOT corrupt AND j < ns)),
        px AS (SELECT doc_id, j,
            sum(('0x' || substr(md5('wd' || doc_id::VARCHAR || ':' ||
              j::VARCHAR || ':' || (i // 16)::VARCHAR),
              (i % 16) * 2 + 1, 2))::BIGINT)::BIGINT AS px_sum
          FROM smp, (SELECT unnest(range(1024)) AS i)
          GROUP BY 1, 2)
        SELECT source, count(*)::BIGINT AS n_samples,
          count(*)::BIGINT AS n_complete,
          count(*)::BIGINT AS n_decoded,
          sum(length('caption ' || doc_id::VARCHAR || ':' ||
            j::VARCHAR))::BIGINT AS sum_caption_len,
          sum(px.px_sum % 1000000007)::BIGINT AS px_fp
        FROM smp JOIN px USING (doc_id, j)
        GROUP BY 1 ORDER BY 1"""),
      "WebDataset TAR shards (plain + gzipped) regrouped into " +
        "image+caption samples by basename stem and decoded through " +
        "the one image kernel — per-sample pixel sums and caption " +
        "lengths replayed from the id arithmetic; bad-checksum " +
        "headers end a shard at exactly the samples before them."),

    GraftQuery(
      "q_multimodal_jpeg", Seq("P6", "A8"),
      (s, dir) => {
        // BASELINE + PROGRESSIVE JPEG through BOTH engines — ImageIO
        // (the kernel chain) and the from-the-spec JpegDecode —
        // pinned to exact arithmetic: per doc a mosaic of FLAT 8x8
        // tiles encoded DC-only at flat quant 8, where every
        // conforming decoder reconstructs each tile integer-exactly
        // (a flat block is round(dc*q/8) + 128 everywhere, and gray
        // pixels survive YCbCr both ways: Cb = Cr = 128 exactly).
        // Legs: 4:4:4 and 4:2:0 sampling (constant chroma upsamples
        // exactly under any filter), restart intervals, single-
        // component grayscale frames, and every 4th doc a SOF2
        // PROGRESSIVE stream (the Annex G scan script reassembles
        // the identical coefficients, so the tile arithmetic holds
        // unchanged). n_agree pins the two engines to EACH OTHER;
        // px_fp pins them to the oracle's tile arithmetic — a
        // marker, Huffman, DC-prediction, EOB-run, refinement,
        // dequantize, IDCT, upsample, or color-convert slip fails
        // the hash. Stateless per-row encode+decode; one (source)
        // rollup shuffle.
        import graft.operators.{JpegDecode, PixelDecode}
        val mkJpeg = udf((docId: Long) => {
          def v(bx: Int, by: Int): Int =
            (((docId % 97) * 31 + bx * 5 + by * 11) % 256).toInt
          val img = Array.tabulate(32 * 24) { i =>
            val g = v((i % 32) / 8, (i / 32) / 8)
            (g << 16) | (g << 8) | g
          }
          val sub = if (docId % 2 == 0) "444" else "420"
          val rst = if (docId % 3 == 0) 2 else 0
          val gry = docId % 5 == 0
          if (docId % 4 == 1)
            JpegDecode.encodeProgressive(32, 24, img, lumaQ = 8,
              chromaQ = 8, subsample = sub, restartInterval = rst,
              gray = gry)
          else
            JpegDecode.encodeJpeg(32, 24, img, lumaQ = 8,
              chromaQ = 8, subsample = sub, restartInterval = rst,
              gray = gry)
        })
        val pureSum = udf((jpeg: Array[Byte]) =>
          JpegDecode.decode(jpeg).map { px =>
            var s = 0L
            PixelDecode.grayLuma(px).foreach(s += _)
            s
          }.getOrElse(-1L))
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 7 === 3)
          .select(col("doc_id"), col("source"))
          .withColumn("jpeg", mkJpeg(col("doc_id")))
          .withColumn("mf", Multimodal.featuresColumn(col("jpeg")))
          .withColumn("pure_sum", pureSum(col("jpeg")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("mf.decoded"), 1L).otherwise(0L))
              .as("n_decoded"),
            sum(when(col("mf.px_sum") === col("pure_sum"), 1L)
              .otherwise(0L)).as("n_agree"),
            sum(col("mf.width")).as("sum_w"),
            sum(col("pure_sum") % 1000000007L).as("px_fp"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source
            FROM documents WHERE doc_id % 7 = 3),
        t AS (SELECT doc_id, source,
            ((doc_id % 97) * 31 + (i % 4) * 5 + (i // 4) * 11) % 256
              AS v
          FROM d, (SELECT unnest(range(12)) AS i)),
        px AS (SELECT doc_id, source,
            (sum(v) * 64)::BIGINT AS px_sum
          FROM t GROUP BY 1, 2)
        SELECT source, count(*)::BIGINT AS n_docs,
          count(*)::BIGINT AS n_decoded,
          count(*)::BIGINT AS n_agree,
          (count(*) * 32)::BIGINT AS sum_w,
          sum(px_sum % 1000000007)::BIGINT AS px_fp
        FROM px GROUP BY 1 ORDER BY 1"""),
      "Baseline AND progressive (SOF2) JPEG mosaics of DC-only flat " +
        "tiles decoded through BOTH engines — ImageIO and the " +
        "from-the-spec decoder — with 4:4:4/4:2:0, restart, and " +
        "grayscale legs; engine agreement and the exact per-tile " +
        "pixel arithmetic both pinned by the oracle."),

    GraftQuery(
      "q_multimodal_png", Seq("P6", "A8"),
      (s, dir) => {
        // The FULL PNG IHDR matrix through BOTH engines — ImageIO
        // (the kernel chain) and the from-the-spec decodePngPure —
        // under exact pixel arithmetic (PNG is lossless, so the pin
        // is equality, no tolerance): per doc a gray 32x24 tile
        // mosaic, rotated through four legs by doc id — sequential
        // gray8, ADAM7-interlaced gray8, Adam7 PALETTE-16 (depth 4,
        // sub-byte samples), and Adam7 16-BIT gray (g*257 values,
        // whose high-byte reduction is exact). n_agree pins the two
        // engines to each other; px_fp pins them to the oracle's
        // tile arithmetic — an interlace-geometry, bit-unpack,
        // palette, 16-bit-reduction, filter, or inflate slip fails
        // the hash. Stateless per-row encode+decode; one (source)
        // rollup shuffle.
        import graft.operators.PixelDecode
        import java.awt.image.{BufferedImage, IndexColorModel}
        val mkPng = udf((docId: Long) => {
          def v(bx: Int, by: Int): Int =
            (((docId % 89) * 29 + bx * 7 + by * 13) % 256).toInt
          // the slice is odd ids only, so the leg must rotate on
          // doc_id / 8, not doc_id % 4
          val leg = (docId / 8 % 4).toInt
          val img = leg match {
            case 2 =>
              val pal = Array.tabulate(16)(i => (i * 17).toByte)
              val icm = new IndexColorModel(4, 16, pal, pal, pal)
              new BufferedImage(32, 24,
                BufferedImage.TYPE_BYTE_BINARY, icm)
            case 3 => new BufferedImage(32, 24,
              BufferedImage.TYPE_USHORT_GRAY)
            case _ => new BufferedImage(32, 24,
              BufferedImage.TYPE_BYTE_GRAY)
          }
          // write RASTER samples, never setRGB: setRGB routes the
          // sRGB triple through the gray/indexed color model's
          // colorimetric conversion and the stored sample drifts
          for (y <- 0 until 24; x <- 0 until 32) {
            val sample = leg match {
              case 2 => v(x / 8, y / 8) % 16 // palette INDEX
              case 3 => v(x / 8, y / 8) * 257
              case _ => v(x / 8, y / 8)
            }
            img.getRaster.setSample(x, y, 0, sample)
          }
          val baos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          val w = javax.imageio.ImageIO
            .getImageWritersByFormatName("png").next()
          w.setOutput(ios)
          val p = w.getDefaultWriteParam
          if (leg != 0) p.setProgressiveMode(
            javax.imageio.ImageWriteParam.MODE_DEFAULT)
          w.write(null, new javax.imageio.IIOImage(img, null, null), p)
          w.dispose()
          ios.close()
          baos.toByteArray
        })
        val pureSum = udf((png: Array[Byte]) =>
          PixelDecode.decodePngPure(png).map { px =>
            var sum = 0L
            PixelDecode.grayLuma(px).foreach(sum += _)
            sum
          }.getOrElse(-1L))
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 8 === 5)
          .select(col("doc_id"), col("source"))
          .withColumn("png", mkPng(col("doc_id")))
          .withColumn("mf", Multimodal.featuresColumn(col("png")))
          .withColumn("pure_sum", pureSum(col("png")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("mf.decoded"), 1L).otherwise(0L))
              .as("n_decoded"),
            sum(when(col("mf.px_sum") === col("pure_sum"), 1L)
              .otherwise(0L)).as("n_agree"),
            sum(col("mf.width")).as("sum_w"),
            sum(col("pure_sum") % 1000000007L).as("px_fp"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (doc_id // 8) % 4 AS leg
          FROM documents WHERE doc_id % 8 = 5),
        t AS (SELECT doc_id, source,
            CASE WHEN leg = 2
              THEN (((doc_id % 89) * 29 + (i % 4) * 7 +
                (i // 4) * 13) % 256 % 16) * 17
              ELSE ((doc_id % 89) * 29 + (i % 4) * 7 +
                (i // 4) * 13) % 256 END AS g
          FROM d, (SELECT unnest(range(12)) AS i)),
        px AS (SELECT doc_id, source,
            (sum(g) * 64)::BIGINT AS px_sum
          FROM t GROUP BY 1, 2)
        SELECT source, count(*)::BIGINT AS n_docs,
          count(*)::BIGINT AS n_decoded,
          count(*)::BIGINT AS n_agree,
          (count(*) * 32)::BIGINT AS sum_w,
          sum(px_sum % 1000000007)::BIGINT AS px_fp
        FROM px GROUP BY 1 ORDER BY 1"""),
      "The full PNG IHDR matrix — sequential and Adam7-interlaced " +
        "gray8, Adam7 palette-16 (sub-byte samples), Adam7 16-bit " +
        "gray — through BOTH engines under exact (lossless) pixel " +
        "arithmetic replayed by the oracle."),

    GraftQuery(
      "q_multimodal_bmp", Seq("P6", "A8"),
      (s, dir) => {
        // The classic BMP matrix through BOTH engines — ImageIO
        // (the kernel chain) and the from-the-spec decodeBmpPure —
        // under exact pixel arithmetic: per doc a gray 32x24 tile
        // mosaic rotated through three legs — plain 8-bit palette,
        // RLE8 (the mosaic's 8-wide tile runs make the compression
        // real), and 16-bit X1R5G5B5 whose tile values sit on the
        // bit-replication lattice so the 5-bit round-trip is exact.
        // n_agree pins the engines to each other; px_fp pins them
        // to the oracle's tile arithmetic — a palette, run-length,
        // bottom-up, padding, or channel-expansion slip fails the
        // hash. Stateless per-row; one (source) rollup shuffle.
        import graft.operators.PixelDecode
        val mkBmp = udf((docId: Long) => {
          def v(bx: Int, by: Int): Int =
            (((docId % 83) * 37 + bx * 11 + by * 5) % 256).toInt
          val leg = (docId / 9 % 3).toInt
          if (leg == 2) {
            val rgb = Array.tabulate(32 * 24) { i =>
              val k = v((i % 32) / 8, (i / 32) / 8) % 32
              val g = (k * 255 + 15) / 31 // the round-scaling lattice
              (g << 16) | (g << 8) | g
            }
            PixelDecode.encodeBmp16(32, 24, rgb)
          } else {
            val pal = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
            val idx = Array.tabulate(32 * 24)(i =>
              v((i % 32) / 8, (i / 32) / 8))
            PixelDecode.encodeBmp8(32, 24, idx, pal, rle = leg == 1)
          }
        })
        val pureSum = udf((bmp: Array[Byte]) =>
          PixelDecode.decodeBmpPure(bmp).map { px =>
            var sum = 0L
            PixelDecode.grayLuma(px).foreach(sum += _)
            sum
          }.getOrElse(-1L))
        Tables.load(s, dir, "documents")
          .where(col("doc_id") % 9 === 3)
          .select(col("doc_id"), col("source"))
          .withColumn("bmp", mkBmp(col("doc_id")))
          .withColumn("mf", Multimodal.featuresColumn(col("bmp")))
          .withColumn("pure_sum", pureSum(col("bmp")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("mf.decoded"), 1L).otherwise(0L))
              .as("n_decoded"),
            sum(when(col("mf.px_sum") === col("pure_sum"), 1L)
              .otherwise(0L)).as("n_agree"),
            sum(col("mf.height")).as("sum_h"),
            sum(col("pure_sum") % 1000000007L).as("px_fp"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
            (doc_id // 9) % 3 AS leg
          FROM documents WHERE doc_id % 9 = 3),
        t AS (SELECT doc_id, source,
            CASE WHEN leg = 2 THEN
              ((((doc_id % 83) * 37 + (i % 4) * 11 +
                (i // 4) * 5) % 256 % 32) * 255 + 15) // 31
            ELSE ((doc_id % 83) * 37 + (i % 4) * 11 +
              (i // 4) * 5) % 256 END AS g
          FROM d, (SELECT unnest(range(12)) AS i)),
        px AS (SELECT doc_id, source,
            (sum(g) * 64)::BIGINT AS px_sum
          FROM t GROUP BY 1, 2)
        SELECT source, count(*)::BIGINT AS n_docs,
          count(*)::BIGINT AS n_decoded,
          count(*)::BIGINT AS n_agree,
          (count(*) * 24)::BIGINT AS sum_h,
          sum(px_sum % 1000000007)::BIGINT AS px_fp
        FROM px GROUP BY 1 ORDER BY 1"""),
      "The classic BMP matrix — plain 8-bit palette, RLE8, 16-bit " +
        "X1R5G5B5 on the round-scaling lattice — through BOTH " +
        "engines under the oracle's exact tile arithmetic."),

    GraftQuery(
      "q_pipeline_crawl", Seq("S1", "P6", "D5", "D9"),
      (s, dir) => {
        // The CRAWL-PLANNING front-end, composed: CDXJ index shards
        // (writer -> forgiving reader; every 13th doc's utm-twin
        // capture carries a SHORT timestamp and is lost; every 13th
        // doc also drags a garbage line the walk must skip) ->
        // status gate (404 captures drop) -> RFC 9309 robots gate
        // (each host Disallows /no; the /no/sec capture drops) ->
        // frontier dedup on the canonical URL (normalizeUrl: the
        // ?utm_source twin collapses onto its clean sibling,
        // keep-first by capture timestamp) -> per-source funnel.
        // Every stage count and the surviving offsets replay from
        // id arithmetic in the oracle — an index-parse, status,
        // group-selection, longest-match, canonicalization, or
        // keep-first slip changes the funnel and fails the hash.
        // All joins are host-/urlkey-/nurl-keyed equi-joins.
        import graft.operators.{Cdx, Robots, TextOps}
        import graft.operators.CorpusFunnel
        import graft.operators.CorpusFunnel.{AggStage, CountStage}
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
          .where(col("doc_id") % 9 === 7)
          .select(col("doc_id"), col("source"))
          .withColumn("g", expr("doc_id - doc_id % 12"))
        val lines = docs
          .withColumn("k", explode(typedLit(Seq(0, 1, 2, 3))))
          .withColumn("url", expr(
            "concat('https://c', g, '.ex.net'," +
              " case k when 0 then concat('/page', doc_id)" +
              " when 1 then concat('/page', doc_id, '?utm_source=x')" +
              " when 2 then concat('/no/sec', doc_id)" +
              " else concat('/gone', doc_id) end)"))
          .withColumn("ts", expr(
            "case when k = 1 and doc_id % 13 = 0 then '2026' else" +
              " concat('20260101', lpad(cast(doc_id % 10000 as" +
              " string), 4, '0'), '0', k) end"))
          .withColumn("line", Cdx.cdxjLine(col("url"), col("ts"),
            lit("text/html"),
            expr("cast(case when k = 3 then 404 else 200 end as int)"),
            expr("concat('sha1:', doc_id, ':', k)"),
            expr("cast(500 + k as bigint)"),
            expr("cast(doc_id * 31 % 90000 + k as bigint)"),
            expr("concat('seg-', g, '.warc.gz')")))
          .groupBy("doc_id", "source")
          .agg(expr("array_join(transform(array_sort(" +
            "collect_list(struct(k, line))), x -> x.line), '\\n')")
            .as("text"))
          .withColumn("text", expr(
            "case when doc_id % 13 = 0 then concat(text," +
              " '\\nGARBAGE') else text end"))
          .select("source", "text")
        val recs = Cdx.cdxjRecords(lines, "text")
          .select("source", "url", "ts", "status", "offset")
          .localCheckpoint(eager = false) // one parse feeds every stage
        val ok = recs.where(col("status") === 200)
        val robots = docs.groupBy("g").agg(count(lit(1)).as("__n"))
          .withColumn("host", expr("concat('c', g, '.ex.net')"))
          .withColumn("txt",
            lit("User-agent: *\nDisallow: /no\n"))
          .select("host", "txt")
        val allowed = Robots.robotsFilter(ok, "url", robots,
          "host", "txt", "graftbot")
        val norm = udf((u: String) => TextOps.normalizeUrl(u))
        val frontier = allowed
          .withColumn("nurl", norm(col("url")))
          .withColumn("rk", row_number().over(
            Window.partitionBy("nurl").orderBy("ts", "url")))
          .where(col("rk") === 1)
        CorpusFunnel.stageCounts("source", Seq(
          CountStage("n_idx", recs),
          CountStage("n_ok", ok),
          CountStage("n_allowed", allowed),
          AggStage(frontier.groupBy("source")
            .agg(count(lit(1)).as("n_frontier"),
              sum(col("offset")).as("sum_off"),
              min(col("nurl")).as("min_url")),
            Seq("n_frontier", "sum_off", "min_url"))),
          sparse = true)
      },
      Some("""WITH d AS (SELECT doc_id, source,
            doc_id - doc_id % 12 AS g, (doc_id % 13 = 0) AS corrupt
          FROM documents WHERE doc_id % 9 = 7),
        caps AS (SELECT doc_id, source, g, k, corrupt
          FROM d, (SELECT unnest(range(4)) AS k)
          WHERE NOT (corrupt AND k = 1)),
        agg AS (SELECT source,
            count(*)::BIGINT AS n_idx,
            sum(CASE WHEN k != 3 THEN 1 ELSE 0 END)::BIGINT AS n_ok,
            sum(CASE WHEN k IN (0, 1) THEN 1 ELSE 0 END)::BIGINT
              AS n_allowed
          FROM caps GROUP BY 1),
        fr AS (SELECT source,
            count(*)::BIGINT AS n_frontier,
            sum(doc_id * 31 % 90000)::BIGINT AS sum_off,
            min('https://c' || g::VARCHAR || '.ex.net/page' ||
              doc_id::VARCHAR) AS min_url
          FROM d GROUP BY 1)
        SELECT agg.source, n_idx, n_ok, n_allowed,
          n_frontier, sum_off, min_url
        FROM agg JOIN fr ON agg.source = fr.source
        ORDER BY 1"""),
      "The crawl-planning funnel composed end to end: CDXJ index " +
        "parse with damage legs, status gate, RFC 9309 robots gate, " +
        "canonical-URL frontier dedup with keep-first-by-timestamp " +
        "— every stage count and surviving offset replayed from id " +
        "arithmetic."),
  )
}
