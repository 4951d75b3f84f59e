package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.{Audio, Binary, ImageHash}
import graft.sim.Ann

/** B-block (similarity + multimodal): ANN over `embeddings`, centroid
  * analytics, and binary-column plumbing over `documents`.
  */
object SimQueries {
  type Q = (SparkSession, String) => DataFrame

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id").as("id"), Ann.toDouble(col("embedding")).as("vec"), col("label"))

  val defs: Map[String, Q] = Map(
    // ---- q27: exact brute-force top-k cosine (correctness baseline) ----
    "q27_ann_bruteforce" -> { (s, d) =>
      val v = vecs(s, d)
      Ann.bruteforceTopK(v, v.filter(col("id") < 10), 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },

    // ---- q28: random-hyperplane LSH bucket assignment (index build) ----
    "q28_ann_lsh" -> { (s, d) =>
      Ann.hyperplaneBuckets(vecs(s, d), 8)
        .select(col("id").as("vec_id"), col("bucket"))
        .orderBy(col("vec_id"))
    },

    // ---- q29: per-label centroid + distance-to-centroid ----
    "q29_embed_centroid" -> { (s, d) =>
      val ex = vecs(s, d).select(col("id"), col("label"), posexplode(col("vec")).as(Seq("pos", "v")))
      val cent = ex.groupBy(col("label"), col("pos")).agg(avg(col("v")).as("c"))
      ex.join(cent, Seq("label", "pos"))
        .groupBy(col("id"), col("label"))
        .agg(sqrt(sum((col("v") - col("c")) * (col("v") - col("c")))).as("dist"))
        .select(col("id").as("vec_id"), col("label"), round(col("dist"), 6).as("dist_to_centroid"))
        .orderBy(col("vec_id"))
    },

    // ---- q30: multimodal binary payloads + typed REAL decode ----
    // Ingest renders each doc as a spec-valid P6 PPM (raster = the UTF-8
    // bytes on a 32-wide canvas); decode runs the actual header parser on
    // those bytes. The oracle recomputes the metadata arithmetically from
    // octet_length (closed-form by construction of the canvas).
    "q30_multimodal_meta" -> { (s, d) =>
      Binary.metadata(s, Tables.documents(s, d)).toDF()
        .orderBy(col("doc_id"))
    },

    // ---- q35: bucketed ANN — top-1 in-bucket neighbor per vector ----
    "q35_dedup_cosine" -> { (s, d) =>
      val v = vecs(s, d)
      Ann.bucketTop1(v, Ann.hyperplaneBuckets(v, 8))
        .select(col("id").as("vec_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cosine"), col("bucket"))
        .orderBy(col("vec_id"))
    },

    // ---- q86: SemDeDup-style embedding dedup verdicts ----
    // Drop a vector when an earlier-id vector in its LSH bucket covers it
    // at cosine >= tau (covered-by-earlier, the q68/q72/q82 first-
    // occurrence-wins semantics); the verdict records the smallest-id
    // coverer and the coverer count. tau=0.35 is the DATA-DERIVED test
    // point: the synthetic embeddings are near-uniform (in-bucket cosine
    // tops out ~0.45 at sf0.01 / ~0.6 at sf0.1), so the paper's ~0.95
    // operating point would never fire here; production derives tau from
    // the real cluster-cosine distribution (Ann.semDedup scaladoc).
    "q86_semdedup" -> { (s, d) =>
      val v = vecs(s, d)
      Ann.semDedup(v.select(col("id"), col("vec")),
          Ann.hyperplaneBuckets(v, 8), 0.35)
        .select(col("id").as("vec_id"), col("bucket"),
          col("dropped_by"), col("n_coverers"))
        .orderBy(col("vec_id"))
    },

    // ---- q101: perceptual near-dup image pairs (dHash + banded LSH) ----
    // Ingest renders each doc as a REAL gray-8 PNG (raster = the UTF-8
    // bytes, zero-padded to the 32-wide canvas); the hash runs the actual
    // inflate+defilter pixel decode, then the 60-bit dHash rides SimHash's
    // banded candidate machinery. The oracle recomputes the hash
    // arithmetically from the text bytes (closed-form by construction of
    // the canvas — the q30 discipline) and mirrors the band/cap/Hamming
    // pipeline in SQL.
    "q101_image_dhash" -> { (s, d) =>
      val hashes = ImageHash.dhashes(
        Binary.toPngPayloads(s, Tables.documents(s, d)))
      ImageHash.nearPairs(hashes, maxHamming = 16)
        .select(col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"),
          col("hamming"))
        .orderBy(col("doc_id_a"), col("doc_id_b"))
    },

    // ---- q122: the image INTAKE GATE (the q89 rule gate, for pixels) ----
    // What a LAION-style multimodal intake drops before anything expensive
    // runs: too-small images (min pixels), degenerate aspect ratios, and
    // near-empty/near-solid rasters (min mean fill). Rules are EXACT
    // integer comparisons over the real decode's (width, height, raster
    // byte sum) — one pass per image, per-partition, no shuffle; the
    // oracle recomputes the sum from the text bytes (closed-form by
    // construction of the canvas — the q30/q101 discipline).
    "q122_image_gate" -> { (s, d) =>
      // registerCache: q91's modality rows read the same stats frame
      val st = graft.Graft.registerCache(Binary.imageStats(
        s, Binary.toPpmPayloads(s, Tables.documents(s, d))).toDF())
      val bigEnough = (col("width") * col("height")) >= 128
      // long cross-multiply: a degenerate dimension past ~21.5M px would
      // wrap a 32-bit ×100 negative and PASS the gate it exists to fail
      val aspectOk = greatest(col("width"), col("height")).cast("long") * 100 <=
        least(col("width"), col("height")).cast("long") * 1100
      val filled = col("sum_bytes") >=
        col("width").cast("long") * col("height") * 3 * 80
      st.select(col("doc_id"), col("width"), col("height"), col("sum_bytes"),
          bigEnough.as("big_enough"), aspectOk.as("aspect_ok"),
          filled.as("filled_enough"),
          (bigEnough && aspectOk && filled).as("keep"))
        .orderBy(col("doc_id"))
    },

    // ---- q111: audio sample stats + perceptual near-dup (energy dHash) ----
    // Ingest renders each doc as a REAL mono PCM16 WAV (samples = the
    // closed-form byte waveform s(k) = (byte(k) − 100)·200, the q30/q101
    // canvas discipline); decode runs the actual RIFF/PCM16 sample parser.
    // Per clip: exact stats (peak, Σs², zero crossings) + the 60-bit
    // energy-envelope hash riding SimHash's banded candidate machinery;
    // `dup_candidate` = the smallest earlier clip within Hamming 16 (the
    // q86 covered-by-earlier shape — keepSet's CC step stays engine-side,
    // spec-gated, like q101). The oracle recomputes EVERYTHING
    // arithmetically from the text bytes: integer-exact but for rms and
    // duration, where both engines run the identical cast/divide/sqrt
    // sequence and round at 6.
    "q111_audio_dedup" -> { (s, d) =>
      val clips = graft.Graft.registerCache(
        Audio.clipRows(Audio.toWavPayloads(s, Tables.documents(s, d))).toDF())
      val dup = Audio.nearPairs(clips, maxHamming = 16)
        .groupBy(col("id_b").as("doc_id"))
        .agg(min(col("id_a")).as("dup_candidate"))
      clips.join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"),
          col("n_samples").cast("long").as("n_samples"),
          // the row's OWN declared rate (the oracle divides by the synth
          // constant — identical while toWavPayloads writes SampleRate,
          // and honest for any re-rated clip fed through the same query)
          round(col("n_samples") / col("sample_rate").cast("double"), 6)
            .as("duration_s"),
          col("peak").cast("long").as("peak"),
          round(sqrt(col("sum_sq").cast("double") / col("n_samples")), 6).as("rms"),
          col("n_zero_crossings").cast("long").as("n_zero_crossings"),
          col("fp"), col("dup_candidate"))
        .orderBy(col("doc_id"))
    },

    // ---- q123: the audio INTAKE GATE (q89/q122, for samples) ----
    // What an audio intake drops before fingerprinting: too-short clips
    // (min samples), near-silence (RMS floor as an exact integer cross-
    // multiplication — sum_sq·1000 ≥ n·threshold², no float compare), and
    // noise-like signals (zero-crossing-rate ceiling, same discipline).
    // Rides the SAME cached clipRows frame as q111 — the decode is paid
    // once for the dedup and the gate together.
    "q123_audio_gate" -> { (s, d) =>
      val clips = graft.Graft.registerCache(
        Audio.clipRows(Audio.toWavPayloads(s, Tables.documents(s, d))).toDF())
      val longEnough = col("n_samples") >= 256
      val loudEnough = col("sum_sq") * 1000 >=
        col("n_samples").cast("long") * 36600000000L
      val steady = col("n_zero_crossings").cast("long") * 1000 <=
        col("n_samples").cast("long") * 505
      clips.select(col("doc_id"),
          col("n_samples").cast("long").as("n_samples"), col("sum_sq"),
          col("n_zero_crossings").cast("long").as("n_zero_crossings"),
          longEnough.as("long_enough"), loudEnough.as("loud_enough"),
          steady.as("steady_enough"),
          (longEnough && loudEnough && steady).as("keep"))
        .orderBy(col("doc_id"))
    },

    // ---- q55: trained IVF quantizer (k-means cell build) ----
    // Deterministic end to end (farthest-point seeding + Lloyd, no RNG),
    // but k-means is not practically SQL-expressible — no oracleSql entry,
    // so the driver records the weaker rows-only check; AnnSpec carries
    // the strong checks (cell purity + trained recall gates).
    "q55_kmeans_cells" -> { (s, d) =>
      Ann.kmeansCells(vecs(s, d).select(col("id"), col("vec")), 4, 2)
        .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
        .orderBy(col("label"))
    },

    // ---- q73: IVF-PQ ANN (coarse cells + product-quantized ADC rank) ----
    // The memory-scale ANN path: 8 one-byte codes stand in for the 64
    // doubles at candidate-scoring time. Codebook training is driver-local
    // Lloyd on a bounded deterministic sample — not SQL-expressible, so no
    // oracleSql (rows-only driver check); AnnSpec carries the strong
    // checks (code range/determinism + recall gates vs exact top-k).
    "q73_ann_ivfpq" -> { (s, d) =>
      val v = vecs(s, d)
      Ann.ivfPqTopK(v, v.filter(col("id") < 10), m = 8, ksub = 16,
          nprobe = 2, k = 3, rerank = 32)
        .orderBy(col("query_id"), col("rank"))
    },

    // ---- q124: HNSW graph ANN (sim/Hnsw.scala, r18) ----
    // The public graph-index standard (Malkov–Yashunin 2016), sharded:
    // per-partition graphs built in one mapPartitions pass, broadcast
    // queries search every shard, global top-k merge. Rows-only by design
    // (a beam search over a driver-opaque graph isn't SQL-expressible);
    // the strong gates are AnnSpec's: recall >= IVF-PQ at EQUAL candidate
    // budget, exact at full ef, deterministic across runs, exact cosine
    // scores.
    "q124_ann_hnsw" -> { (s, d) =>
      val v = vecs(s, d)
      graft.sim.Hnsw.hnswTopK(v, v.filter(col("id") < 10), k = 3,
          m = 12, efConstruction = 48, efSearch = 32, shards = 2)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },

    // ---- q110: PCA projection (scoring face) ----
    // The dimensionality-reduction step SemDeDup-style pipelines run
    // before clustering. FIT (scatter pass + driver Jacobi eigen,
    // sim/Pca.scala) is the q95/q100 train discipline and is spec-gated
    // (known-matrix eigenpairs, orthonormality, residuals, variance
    // capture on correlated data); the ORACLE pins the PROJECTION
    // machinery under a closed-form DYADIC component matrix
    // (w(i,j) = ((31i+7j) mod 17 − 8)/16, mean 0): every per-term
    // product is exact (dyadic × float), both engines fold the same
    // sequence left-to-right (graft_dot == list_sum — the q27
    // discipline), and the display rounds at 6.
    "q110_pca_project" -> { (s, d) =>
      val (k, dim) = (4, 64)
      val w = Array.tabulate(k, dim)((i, j) =>
        (((i * 31 + j * 7) % 17) - 8) / 16.0)
      val model = graft.sim.Pca.Model(
        Array.fill(dim)(0.0), Array.fill(k)(0.0), w)
      graft.sim.Pca.transform(Tables.embeddings(s, d), "embedding", model, "p")
        .select(col("vec_id"), posexplode(col("p")).as(Seq("comp", "proj")))
        .select(col("vec_id"), col("comp"), round(col("proj"), 6).as("proj"))
        .orderBy(col("vec_id"), col("comp"))
    }
  )

  // ---------------- DuckDB oracle fragments ----------------

  private val E = "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"

  /** Sequential-fold dot product of two DOUBLE[] expressions (bit-identical
    * to Spark's zip_with + aggregate left fold).
    */
  private def dotSql(a: String, b: String) =
    s"list_sum([$a[i] * $b[i] for i in range(1, len($b) + 1)])"

  private def cosSql(a: String, b: String) =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Hyperplane-bucket CTEs (expects `e`); yields bk(vec_id, bucket). */
  private val BUCKET_CTES =
    """ex AS (SELECT vec_id, v, unnest(range(len(v))) AS pos FROM e),
       pj AS (SELECT vec_id, pos, v[pos + 1] AS val, j,
           CASE WHEN substr(md5(j::VARCHAR || '-' || pos::VARCHAR), 1, 1) >= '8'
                THEN 1 ELSE -1 END AS sgn
         FROM ex CROSS JOIN (SELECT unnest(range(8)) AS j) js),
       bits AS (SELECT vec_id, j, sum(val * sgn) AS s FROM pj GROUP BY 1, 2),
       bk AS (SELECT vec_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
         FROM bits GROUP BY 1)"""

  val oracle: Map[String, String] = Map(
    "q27_ann_bruteforce" ->
      s"""WITH $E,
         q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         pairs AS (SELECT qid, e.vec_id AS nid, ${cosSql("qv", "v")} AS cos
           FROM q, e WHERE qid <> e.vec_id),
         ranked AS (SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
           FROM pairs)
         SELECT qid AS query_id, rank, nid AS neighbor_id, round(cos, 6) AS cosine
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""",

    "q28_ann_lsh" ->
      s"""WITH $E, $BUCKET_CTES
         SELECT vec_id, bucket::BIGINT AS bucket FROM bk ORDER BY vec_id""",

    "q29_embed_centroid" ->
      s"""WITH e2 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         ex AS (SELECT vec_id, label, v, unnest(range(len(v))) AS pos FROM e2),
         pv AS (SELECT vec_id, label, pos, v[pos + 1] AS val FROM ex),
         cent AS (SELECT label, pos, avg(val) AS c FROM pv GROUP BY 1, 2)
         SELECT pv.vec_id, pv.label,
           round(sqrt(sum((pv.val - cent.c) * (pv.val - cent.c))), 6) AS dist_to_centroid
         FROM pv JOIN cent ON pv.label = cent.label AND pv.pos = cent.pos
         GROUP BY 1, 2 ORDER BY vec_id""",

    // q122: the raster IS the text (ASCII, zero-padded to the 32-wide
    // canvas — MetaSpec pins the corpus ASCII), so the byte sum is the
    // char-code sum and every rule is the same integer arithmetic.
    "q122_image_gate" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len,
           greatest(1, (octet_length(encode(text)) + 95) // 96) AS h
           FROM documents),
         s AS (SELECT doc_id, 32 AS width, h::INT AS height,
             coalesce(list_sum([ascii(substr(text, i, 1)) for i in range(1, len + 1)]), 0)::BIGINT AS sum_bytes
           FROM d)
         SELECT doc_id, width, height, sum_bytes,
           width * height >= 128 AS big_enough,
           greatest(width, height)::BIGINT * 100 <= least(width, height)::BIGINT * 1100 AS aspect_ok,
           sum_bytes >= width::BIGINT * height * 3 * 80 AS filled_enough,
           (width * height >= 128
             AND greatest(width, height)::BIGINT * 100 <= least(width, height)::BIGINT * 1100
             AND sum_bytes >= width::BIGINT * height * 3 * 80) AS keep
         FROM s ORDER BY doc_id""",

    "q30_multimodal_meta" ->
      """WITH h AS (SELECT doc_id,
           greatest(1, cast(ceil(octet_length(encode(text)) / 96.0) AS BIGINT)) AS ph
           FROM documents)
         SELECT doc_id,
           (11 + length(ph::VARCHAR) + 96 * ph)::INT AS byte_len,
           32 AS width,
           ph::INT AS height,
           'ppm' AS format
         FROM h ORDER BY doc_id""",

    // The dHash is closed-form in the doc's bytes: the PNG raster IS the
    // text (ASCII by construction of the generator; zero-padded), so grid
    // sample (r,c) of a len-byte doc on the 32-wide, h-row canvas is byte
    // (r·h/6)·32 + (c·32/11). Bands/cap/Hamming mirror SimHash's oracle
    // shape; the 600 cap never bites at oracle SFs (max bucket 80 at
    // sf0.1) so capped semantics are bit-identical there.
    "q101_image_dhash" ->
      """WITH d AS (
           SELECT doc_id, text, length(text) AS len,
                  greatest(1, (length(text)+31)//32) AS h
           FROM documents
         ), grid AS (
           SELECT doc_id, gr.range AS r, gc.range AS c,
                  CASE WHEN ((gr.range*h)//6)*32 + ((gc.range*32)//11) < len
                       THEN ascii(substr(text, ((gr.range*h)//6)*32 + ((gc.range*32)//11) + 1, 1))
                       ELSE 0 END AS g
           FROM d, range(6) gr, range(11) gc
         ), bits AS (
           SELECT a.doc_id, a.r, a.c,
                  CASE WHEN a.g > b.g THEN 1::BIGINT ELSE 0::BIGINT END AS bit
           FROM grid a JOIN grid b ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
         ), hash AS (
           SELECT doc_id, bit_or(bit << (r*10 + c)::INT) AS dh FROM bits GROUP BY doc_id
         ), banded AS (
           SELECT doc_id, dh, b.range AS band, (dh >> (b.range*10)::INT) & 1023 AS band_val
           FROM hash, range(6) b
         ), capped AS (
           SELECT doc_id, dh, band, band_val FROM
             (SELECT *, count(*) OVER (PARTITION BY band, band_val) AS n FROM banded)
           WHERE n <= 600
         ), pairs AS (
           SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, a.dh AS ha, b.dh AS hb
           FROM capped a JOIN capped b
             ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         )
         SELECT doc_id_a, doc_id_b, bit_count(xor(ha, hb)) AS hamming
         FROM pairs WHERE bit_count(xor(ha, hb)) <= 16
         ORDER BY doc_id_a, doc_id_b""",

    // q111: samples from the closed-form byte waveform; stats integer-
    // exact (Σs² as BIGINT); the envelope hash mirrors energyHash60's
    // nearest-sample frame bounds; bands/cap/Hamming mirror the q101
    // pipeline; rms/duration run the identical cast→divide→sqrt→round
    // sequence in both engines.
    "q111_audio_dedup" ->
      """WITH d AS (SELECT doc_id, text, greatest(1, length(text)) AS n FROM documents),
         sm AS (SELECT doc_id, n,
             [CASE WHEN k <= length(text) THEN (ascii(substr(text, k, 1)) - 100) * 200
               ELSE 0 END for k in range(1, n + 1)] AS s
           FROM d),
         st AS (SELECT doc_id, n,
             list_max(list_transform(s, x -> abs(x))) AS peak,
             list_sum(list_transform(s, x -> x::BIGINT * x)) AS sum_sq,
             coalesce(list_sum([CASE WHEN s[k] * s[k + 1] < 0 THEN 1 ELSE 0 END
               for k in range(1, n)]), 0) AS zc
           FROM sm),
         fr AS (SELECT doc_id, f.range AS f,
             coalesce(list_sum(list_transform(
               s[(f.range * n // 61 + 1):((f.range + 1) * n // 61)],
               x -> x::BIGINT * x)), 0) AS e
           FROM sm, range(61) f),
         bits AS (SELECT a.doc_id, a.f,
             CASE WHEN a.e > b.e THEN 1::BIGINT ELSE 0::BIGINT END AS bit
           FROM fr a JOIN fr b ON a.doc_id = b.doc_id AND b.f = a.f + 1),
         fph AS (SELECT doc_id, bit_or(bit << f::INT) AS fp FROM bits GROUP BY doc_id),
         banded AS (SELECT doc_id, fp, b.range AS band,
             (fp >> (b.range * 10)::INT) & 1023 AS band_val
           FROM fph, range(6) b),
         capped AS (SELECT doc_id, fp, band, band_val FROM
             (SELECT *, count(*) OVER (PARTITION BY band, band_val) AS bn FROM banded)
           WHERE bn <= 600),
         pairs AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb,
             a.fp AS fa, b.fp AS fb
           FROM capped a JOIN capped b
             ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id),
         dup AS (SELECT idb AS doc_id, min(ida) AS dup_candidate FROM pairs
           WHERE bit_count(xor(fa, fb)) <= 16 GROUP BY idb)
         SELECT st.doc_id, st.n::BIGINT AS n_samples,
           round(st.n / 8000.0, 6) AS duration_s,
           st.peak::BIGINT AS peak,
           round(sqrt(st.sum_sq::DOUBLE / st.n), 6) AS rms,
           st.zc::BIGINT AS n_zero_crossings,
           fph.fp AS fp, dup.dup_candidate
         FROM st JOIN fph USING (doc_id) LEFT JOIN dup USING (doc_id)
         ORDER BY st.doc_id""",

    // q123: q111's stats CTEs + the gate's exact integer rules.
    "q123_audio_gate" ->
      """WITH d AS (SELECT doc_id, text, greatest(1, length(text)) AS n FROM documents),
         sm AS (SELECT doc_id, n,
             [CASE WHEN k <= length(text) THEN (ascii(substr(text, k, 1)) - 100) * 200
               ELSE 0 END for k in range(1, n + 1)] AS s
           FROM d),
         st AS (SELECT doc_id, n,
             list_sum(list_transform(s, x -> x::BIGINT * x)) AS sum_sq,
             coalesce(list_sum([CASE WHEN s[k] * s[k + 1] < 0 THEN 1 ELSE 0 END
               for k in range(1, n)]), 0) AS zc
           FROM sm)
         SELECT doc_id, n::BIGINT AS n_samples, sum_sq::BIGINT AS sum_sq,
           zc::BIGINT AS n_zero_crossings,
           n >= 256 AS long_enough,
           sum_sq * 1000 >= n * 36600000000 AS loud_enough,
           zc * 1000 <= n * 505 AS steady_enough,
           (n >= 256 AND sum_sq * 1000 >= n * 36600000000
             AND zc * 1000 <= n * 505) AS keep
         FROM st ORDER BY doc_id""",

    "q35_dedup_cosine" ->
      s"""WITH $E, $BUCKET_CTES,
         eb AS (SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk ON e.vec_id = bk.vec_id),
         pairs AS (SELECT a.vec_id, b.vec_id AS neighbor_id, a.bucket,
             ${cosSql("a.v", "b.v")} AS cos
           FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY cos DESC, neighbor_id) AS rn FROM pairs)
         SELECT vec_id, neighbor_id, round(cos, 6) AS cosine, bucket::BIGINT AS bucket
         FROM ranked WHERE rn = 1 ORDER BY vec_id""",

    "q86_semdedup" ->
      s"""WITH $E, $BUCKET_CTES,
         eb AS (SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk ON e.vec_id = bk.vec_id),
         drops AS (SELECT b.vec_id, min(a.vec_id) AS dropped_by,
             count(*)::BIGINT AS n_coverers
           FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
             AND ${cosSql("a.v", "b.v")} >= 0.35
           GROUP BY 1)
         SELECT bk.vec_id, bk.bucket::BIGINT AS bucket, d.dropped_by,
           coalesce(d.n_coverers, 0) AS n_coverers
         FROM bk LEFT JOIN drops d USING (vec_id) ORDER BY vec_id""",

    // q110: same dyadic weight formula, same left-to-right fold
    // (list_sum == the graft_dot sequential sum — the q27 discipline).
    "q110_pca_project" ->
      s"""WITH $E,
         c AS (SELECT unnest(range(4)) AS comp),
         p AS (SELECT vec_id, comp,
             list_sum([(((comp * 31 + (j - 1) * 7) % 17 - 8) / 16.0) * v[j]
               for j in range(1, len(v) + 1)]) AS proj
           FROM e CROSS JOIN c)
         SELECT vec_id, comp, round(proj, 6) AS proj
         FROM p ORDER BY vec_id, comp"""
  )
}
