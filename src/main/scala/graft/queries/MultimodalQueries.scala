package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Multimodal

/** [EXT] multimodal-column queries. Metadata extraction and the REAL
  * javax.imageio decode path are oracle-checked — the decode query
  * feeds deterministic generated bitmaps whose pixel channels are pure
  * functions of (id, x, y), so DuckDB recomputes the decoded channel
  * statistics analytically without ever seeing the bytes (BMP is
  * lossless and the 8×8 moments divide by a power of two, so the
  * doubles match bit-for-bit). The feature/frame queries run the same
  * plumbing over `documents.text` payloads, exercising the documented
  * byte-histogram fallback for non-image media. */
object MultimodalQueries {

  /** One decode+dHash pass per (session, dir) — Memo-shared by the
    * pair query and the group-closure query (REAL javax.imageio decode
    * of ~5k 18×16 BMPs at sf0.1 dominates; the banded Hamming join
    * over the hash rows is cheap enough to run per query). */
  private def phashHashes(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Memo.cached(s, s"phash|$dir") {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long].flatMap { id =>
        val base = (id, Multimodal.dHash64(Multimodal.syntheticBmp(id, 18, 16)).get)
        if (id < 25)
          Seq(base, (id + 10000L,
            Multimodal.dHash64(Multimodal.syntheticBmp(id, 18, 16, noisy = true)).get))
        else Seq(base)
      }.toDF("img_id", "h")
    }

  /** Banded Hamming pairs over the Memo'd hashes — itself Memo'd (the
    * pair frame is dup-sized) so the pair query and the group closure
    * pay for the banded join once; the pair query reports cold
    * (fullMemoQueries). */
  private def phashPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Memo.cached(s, s"phashp|$dir")(
      graft.ext.Dedup.hamming64Pairs(phashHashes(s, dir), "img_id", "h", 3))

  /** Chroma-aware decode+dHash pass (round 16, VERDICT r15 #6): one
    * decode per image yields all three YUV channel hashes; the luma
    * hash is bit-identical to [[phashHashes]]' by construction. */
  private def phashYuvHashes(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Memo.cached(s, s"phashyuv|$dir") {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id")).as[Long].flatMap { id =>
        def row(imgId: Long, noisy: Boolean) = {
          val (hy, hu, hv) = Multimodal.dHashYuv(
            Multimodal.syntheticBmp(id, 18, 16, noisy = noisy)).get
          (imgId, hy, hu, hv)
        }
        if (id < 25) Seq(row(id, noisy = false), row(id + 10000L, noisy = true))
        else Seq(row(id, noisy = false))
      }.toDF("img_id", "hy", "hu", "hv")
    }

  /** One synth+decode+window pass per (session, dir) — Memo-shared by
    * the energy diagnosis and the silence-trim intervention (the ~5k
    * WAV decodes dominate both at sf0.1). The energy query itself is
    * therefore fully Memo'd and reports cold in the bench
    * (fullMemoQueries). */
  private def audioEnergy(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Memo.cached(s, s"aen|$dir") {
      import s.implicits._
      val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions(_.map(id =>
        Multimodal.MediaRow(id,
          Multimodal.syntheticWav(id, mod = if (id % 7 == 0) 16 else 0))))
      Multimodal.audioEnergyWindows(media, 16, 100000L)
    }

  /** Shared DuckDB CTEs: analytic dHash recomputation + Hamming ≤ 3
    * pairs — byte-identical to [[phashHashes]] + `hamming64Pairs`. */
  private val phashCte =
    """imgs AS (SELECT doc_id AS id, doc_id AS img_id, 0 AS noisy FROM documents
      |  UNION ALL SELECT doc_id, doc_id + 10000, 1 FROM documents WHERE doc_id < 25),
      |gp AS (SELECT img_id, x, y,
      |    ((CASE WHEN noisy = 1 AND (x + y) % 5 = 0
      |           THEN ((id*31 + x*7 + y*13) % 256 + 1) % 256
      |           ELSE (id*31 + x*7 + y*13) % 256 END) * 299
      |     + ((id*17 + x*5 + y*11) % 256) * 587
      |     + ((id*7 + x*3 + y*29) % 256) * 114) // 1000 AS gray
      |  FROM imgs, (SELECT unnest(range(18)) AS x), (SELECT unnest(range(16)) AS y)),
      |bx AS (SELECT img_id, y // 2 AS br, x // 2 AS bc, sum(gray) AS s
      |       FROM gp GROUP BY 1, 2, 3),
      |bits AS (SELECT a.img_id, a.br AS r, a.bc AS c
      |         FROM bx a JOIN bx b ON b.img_id = a.img_id
      |           AND b.br = a.br AND b.bc = a.bc + 1
      |         WHERE a.bc < 8 AND a.s > b.s),
      |hashes AS (SELECT i.img_id,
      |    CAST(coalesce(sum(CASE WHEN r*8 + c = 63
      |      THEN (-9223372036854775807 - 1)
      |      ELSE (1::BIGINT << CAST(r*8 + c AS INT)) END), 0) AS BIGINT) AS h
      |  FROM imgs i LEFT JOIN bits USING (img_id) GROUP BY i.img_id),
      |ppairs AS (SELECT a.img_id AS id_a, b.img_id AS id_b,
      |       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
      |FROM hashes a JOIN hashes b ON a.img_id < b.img_id
      |WHERE bit_count(xor(a.h, b.h)) <= 3)""".stripMargin

  val all: Seq[Q] = Seq(

    // REAL image decode: synthesize an 8×8 BMP per doc, decode it with
    // javax.imageio, emit per-channel mean/std — oracle-checked against
    // the closed-form pixel statistics
    Q("multimodal_image_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        val media = ids.mapPartitions(
          _.map(id => Multimodal.MediaRow(id, Multimodal.syntheticBmp(id))))
        Multimodal.extractFeatures(media).toDF()
          .select(col("id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            round(element_at(col("feature"), 1), 6).as("mean_r"),
            round(element_at(col("feature"), 2), 6).as("mean_g"),
            round(element_at(col("feature"), 3), 6).as("mean_b"),
            round(element_at(col("feature"), 4), 6).as("std_r"),
            round(element_at(col("feature"), 5), 6).as("std_g"),
            round(element_at(col("feature"), 6), 6).as("std_b"))
          .orderBy("id")
      },
      Some("""WITH px AS (SELECT doc_id, x, y,
             |    ((doc_id*31 + x*7 + y*13) % 256) AS r,
             |    ((doc_id*17 + x*5 + y*11) % 256) AS g,
             |    ((doc_id*7 + x*3 + y*29) % 256) AS b
             |  FROM documents, (SELECT unnest(range(8)) AS x), (SELECT unnest(range(8)) AS y))
             |SELECT doc_id AS id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
             |  round(avg(r), 6) AS mean_r, round(avg(g), 6) AS mean_g, round(avg(b), 6) AS mean_b,
             |  round(sqrt(avg(r*r) - avg(r)*avg(r)), 6) AS std_r,
             |  round(sqrt(avg(g*g) - avg(g)*avg(g)), 6) AS std_g,
             |  round(sqrt(avg(b*b) - avg(b)*avg(b)), 6) AS std_b
             |FROM px GROUP BY doc_id ORDER BY id""".stripMargin)),

    // Perceptual-hash image near-dup: REAL decode (18×16 BMP per doc +
    // a re-encode-noise near-duplicate planted for doc_id < 25) →
    // integer-grayscale dHash → Manku-banded Hamming ≤ 3 pairs. The
    // oracle recomputes the hashes analytically from the closed-form
    // pixel pattern and brute-forces all pairs — banding completeness
    // and the decode path are both on trial. Natural 64-bit hashes
    // collide within Hamming 3 with p ≈ 2⁻⁴⁷, so the result is exactly
    // the planted near-dups the noise kept within threshold.
    Q("multimodal_phash_pairs",
      (s, dir) => phashPairs(s, dir).orderBy("id_a", "id_b"),
      Some(s"""WITH $phashCte
             |SELECT id_a, id_b, hamming FROM ppairs ORDER BY 1, 2""".stripMargin)),

    // Image dup GROUPS: connected-component closure over the Hamming
    // pairs (a burst of re-encodes chains A~B~C even when A~C drifts
    // past the threshold) → per-image keep/drop with min-id canonical
    // representative. Same pair→closure→keep machinery as
    // dedup_groups, over perceptual hashes instead of shingles; the
    // decode+hash pass is Memo-shared with the pair query.
    Q("multimodal_phash_groups",
      (s, dir) => graft.ext.Dedup.dedupGroups(
          phashHashes(s, dir).select(col("img_id")), "img_id",
          phashPairs(s, dir))
        .orderBy("img_id"),
      Some(s"""WITH RECURSIVE $phashCte,
             |edges AS (SELECT id_a AS a, id_b AS b FROM ppairs
             |          UNION ALL SELECT id_b, id_a FROM ppairs),
             |reach AS (SELECT a AS id, b AS r FROM edges
             |          UNION
             |          SELECT rc.id, e.b FROM reach rc JOIN edges e ON rc.r = e.a),
             |lab AS (SELECT id, min(r) AS m FROM reach GROUP BY id)
             |SELECT i.img_id,
             |       coalesce(least(l.m, i.img_id), i.img_id) AS keep_id,
             |       (coalesce(least(l.m, i.img_id), i.img_id) = i.img_id) AS keep
             |FROM imgs i LEFT JOIN lab l ON l.id = i.img_id
             |ORDER BY i.img_id""".stripMargin)),

    // Chroma-aware perceptual near-dup (round 16, VERDICT r15 #6's
    // remaining half): the banded candidate join still runs on the
    // LUMA hash alone (same Manku 3-of-6 banding — no new shuffle
    // class), but each candidate pair is refined by the U and V
    // channel dHashes from the same single decode, so a chroma-only
    // re-grade that luma can't see is separable. The oracle
    // recomputes all three channel hashes analytically from the
    // closed-form pixel pattern (integer BT.601 with the +128000
    // numerator offset keeping JVM truncation == SQL floor division)
    // and brute-forces all pairs — banding completeness, the decode,
    // and the chroma refinement are all on trial.
    Q("multimodal_phash_yuv_pairs",
      (s, dir) => {
        val hashes = phashYuvHashes(s, dir)
        val cand = graft.ext.Dedup.hamming64Pairs(
          hashes.select(col("img_id"), col("hy")), "img_id", "hy", 3)
        cand
          .join(hashes.select(col("img_id").as("id_a"),
            col("hu").as("__ua"), col("hv").as("__va")), "id_a")
          .join(hashes.select(col("img_id").as("id_b"),
            col("hu").as("__ub"), col("hv").as("__vb")), "id_b")
          .withColumn("hamming_u",
            expr("CAST(bit_count(__ua ^ __ub) AS BIGINT)"))
          .withColumn("hamming_v",
            expr("CAST(bit_count(__va ^ __vb) AS BIGINT)"))
          .filter(col("hamming_u") <= 3 && col("hamming_v") <= 3)
          .select(col("id_a"), col("id_b"), col("hamming").as("hamming_y"),
            col("hamming_u"), col("hamming_v"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH imgs AS (
             |  SELECT doc_id AS id, doc_id AS img_id, 0 AS noisy FROM documents
             |  UNION ALL
             |  SELECT doc_id, doc_id + 10000, 1 FROM documents WHERE doc_id < 25),
             |px AS (SELECT img_id, x, y,
             |    (CASE WHEN noisy = 1 AND (x + y) % 5 = 0
             |          THEN ((id*31 + x*7 + y*13) % 256 + 1) % 256
             |          ELSE (id*31 + x*7 + y*13) % 256 END) AS r,
             |    (id*17 + x*5 + y*11) % 256 AS g,
             |    (id*7 + x*3 + y*29) % 256 AS b
             |  FROM imgs, (SELECT unnest(range(18)) AS x),
             |       (SELECT unnest(range(16)) AS y)),
             |chl AS (
             |  SELECT img_id, x, y, 'y' AS ch,
             |         (r*299 + g*587 + b*114) // 1000 AS v FROM px
             |  UNION ALL
             |  SELECT img_id, x, y, 'u',
             |         (500*b - 169*r - 331*g + 128000) // 1000 FROM px
             |  UNION ALL
             |  SELECT img_id, x, y, 'v',
             |         (500*r - 419*g - 81*b + 128000) // 1000 FROM px),
             |bx AS (SELECT img_id, ch, y // 2 AS br, x // 2 AS bc,
             |         sum(v) AS s
             |       FROM chl GROUP BY 1, 2, 3, 4),
             |bits AS (SELECT a.img_id, a.ch, a.br AS r, a.bc AS c
             |         FROM bx a JOIN bx b ON b.img_id = a.img_id
             |           AND b.ch = a.ch AND b.br = a.br AND b.bc = a.bc + 1
             |         WHERE a.bc < 8 AND a.s > b.s),
             |hashes AS (SELECT i.img_id, cc.ch,
             |    CAST(coalesce(sum(CASE WHEN r*8 + c = 63
             |      THEN (-9223372036854775807 - 1)
             |      ELSE (1::BIGINT << CAST(r*8 + c AS INT)) END), 0)
             |      AS BIGINT) AS h
             |  FROM imgs i
             |  CROSS JOIN (SELECT unnest(['y', 'u', 'v']) AS ch) cc
             |  LEFT JOIN bits ON bits.img_id = i.img_id AND bits.ch = cc.ch
             |  GROUP BY i.img_id, cc.ch),
             |hw AS (SELECT img_id,
             |    max(CASE WHEN ch = 'y' THEN h END) AS hy,
             |    max(CASE WHEN ch = 'u' THEN h END) AS hu,
             |    max(CASE WHEN ch = 'v' THEN h END) AS hv
             |  FROM hashes GROUP BY img_id)
             |SELECT a.img_id AS id_a, b.img_id AS id_b,
             |  CAST(bit_count(xor(a.hy, b.hy)) AS BIGINT) AS hamming_y,
             |  CAST(bit_count(xor(a.hu, b.hu)) AS BIGINT) AS hamming_u,
             |  CAST(bit_count(xor(a.hv, b.hv)) AS BIGINT) AS hamming_v
             |FROM hw a JOIN hw b ON a.img_id < b.img_id
             |WHERE bit_count(xor(a.hy, b.hy)) <= 3
             |  AND bit_count(xor(a.hu, b.hu)) <= 3
             |  AND bit_count(xor(a.hv, b.hv)) <= 3
             |ORDER BY 1, 2""".stripMargin)),

    // REAL audio decode: synthesize a 64-sample 16-bit PCM WAV per doc,
    // decode it with javax.sound.sampled (container header + PCM
    // frames), emit amplitude statistics — oracle-checked against the
    // closed-form sample function (n=64 is a power of two, so the
    // integer moments divide exactly in doubles on both engines)
    Q("multimodal_audio_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val (rate, ch, n, st) =
              Multimodal.decodeAudio(Multimodal.syntheticWav(id)).get
            (id, rate.toLong, ch.toLong, n, st(0), st(1), st(2).toLong,
              st(3).toLong, st(4).toLong)
          }
        }.toDF("id", "sample_rate", "channels", "n_samples", "mean_amp",
            "rms", "zero_crossings", "s_min", "s_max")
          .withColumn("mean_amp", round(col("mean_amp"), 6))
          .withColumn("rms", round(col("rms"), 6))
          .orderBy("id")
      },
      Some("""WITH s AS (SELECT doc_id, t,
             |    ((doc_id*37 + t*13 + (t*t % 97)*5) % 4001) - 2000 AS v
             |  FROM documents, (SELECT unnest(range(64)) AS t)),
             |w AS (SELECT doc_id, t, v,
             |        lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
             |      FROM s)
             |SELECT doc_id AS id, CAST(8000 AS BIGINT) AS sample_rate,
             |  CAST(1 AS BIGINT) AS channels, CAST(64 AS BIGINT) AS n_samples,
             |  round(avg(v), 6) AS mean_amp,
             |  round(sqrt(avg(CAST(v AS DOUBLE)*v)), 6) AS rms,
             |  CAST(count(*) FILTER (WHERE pv IS NOT NULL
             |    AND (v >= 0) != (pv >= 0)) AS BIGINT) AS zero_crossings,
             |  CAST(min(v) AS BIGINT) AS s_min, CAST(max(v) AS BIGINT) AS s_max
             |FROM w GROUP BY doc_id ORDER BY id""".stripMargin)),

    // Windowed audio energy / silence profile over REAL PCM decode:
    // every 7th doc gets a mod-compressed (quiet) WAV so the silence
    // flag fires on planted windows; the oracle recomputes the sample
    // function analytically (% is sign-of-dividend remainder in both
    // engines, sums are exact BIGINTs, and the silence flag is an
    // integer compare — no float threshold ambiguity)
    Q("multimodal_audio_energy",
      (s, dir) => audioEnergy(s, dir)
        .withColumn("rms", round(col("rms"), 6))
        .orderBy("id", "win"),
      Some("""WITH s AS (SELECT doc_id, t,
             |    CASE WHEN doc_id % 7 = 0
             |      THEN (((doc_id*37 + t*13 + (t*t % 97)*5) % 4001) - 2000) % 16
             |      ELSE ((doc_id*37 + t*13 + (t*t % 97)*5) % 4001) - 2000
             |    END AS v
             |  FROM documents, (SELECT unnest(range(64)) AS t))
             |SELECT doc_id AS id, t // 16 AS win,
             |  CAST(sum(CAST(v AS BIGINT)*v) AS BIGINT) AS sum_sq,
             |  round(sqrt(CAST(sum(CAST(v AS BIGINT)*v) AS BIGINT) / 16.0), 6) AS rms,
             |  CAST(sum(CAST(v AS BIGINT)*v) AS BIGINT) < 100000 AS silent
             |FROM s GROUP BY doc_id, t // 16 ORDER BY id, win""".stripMargin)),

    // Silence-trim intervention composed on the energy diagnosis: per
    // doc, silent windows dropped, kept-sample count and kept-window
    // RMS reported (null for all-silent clips — drop candidates).
    // Shares the Memo'd decode+window pass with the energy query.
    // Audio near-dup candidate groups: integer energy-level +
    // delta-trit fingerprint (coarse loudness contour), one
    // equi-shuffle on the fingerprint, no pair enumeration. Shares the
    // Memo'd decode+window pass with the energy/trim queries.
    Q("multimodal_audio_fingerprint",
      (s, dir) => Multimodal.audioFingerprintGroups(audioEnergy(s, dir))
        .orderBy("fp"),
      Some("""WITH s AS (SELECT doc_id, t,
             |    CASE WHEN doc_id % 7 = 0
             |      THEN (((doc_id*37 + t*13 + (t*t % 97)*5) % 4001) - 2000) % 16
             |      ELSE ((doc_id*37 + t*13 + (t*t % 97)*5) % 4001) - 2000
             |    END AS v
             |  FROM documents, (SELECT unnest(range(64)) AS t)),
             |e AS (SELECT doc_id, t // 16 AS win, sum(CAST(v AS BIGINT)*v) AS ss
             |      FROM s GROUP BY 1, 2),
             |p AS (SELECT doc_id, list(ss ORDER BY win) AS es FROM e GROUP BY doc_id),
             |f AS (SELECT doc_id,
             |  array_to_string(list_transform(es, e -> CAST(least(15, e // 4194304) AS VARCHAR)), '|')
             |  || '#' ||
             |  array_to_string(list_transform(range(1, len(es)),
             |    i -> CASE WHEN es[i+1] > es[i] THEN '2'
             |              WHEN es[i+1] < es[i] THEN '0' ELSE '1' END), '') AS fp
             |  FROM p)
             |SELECT fp, count(*) AS n_docs, min(doc_id) AS min_id
             |FROM f GROUP BY fp HAVING count(*) >= 2 ORDER BY fp""".stripMargin)),

    Q("multimodal_audio_trim",
      (s, dir) => Multimodal.audioTrimSilence(audioEnergy(s, dir), 16)
        .orderBy("id"),
      Some("""WITH s AS (SELECT doc_id, t,
             |    CASE WHEN doc_id % 7 = 0
             |      THEN (((doc_id*37 + t*13 + (t*t % 97)*5) % 4001) - 2000) % 16
             |      ELSE ((doc_id*37 + t*13 + (t*t % 97)*5) % 4001) - 2000
             |    END AS v
             |  FROM documents, (SELECT unnest(range(64)) AS t)),
             |w AS (SELECT doc_id, t // 16 AS win,
             |        CAST(sum(CAST(v AS BIGINT)*v) AS BIGINT) AS ss
             |      FROM s GROUP BY 1, 2)
             |SELECT doc_id AS id, count(*) AS n_windows,
             |  CAST(count(*) FILTER (WHERE ss < 100000) AS BIGINT) AS n_silent,
             |  CAST((count(*) - count(*) FILTER (WHERE ss < 100000)) * 16 AS BIGINT)
             |    AS kept_samples,
             |  round(sqrt(CAST(sum(ss) FILTER (WHERE ss >= 100000) AS BIGINT)
             |    / CAST((count(*) - count(*) FILTER (WHERE ss < 100000)) * 16 AS DOUBLE)), 6)
             |    AS kept_rms
             |FROM w GROUP BY doc_id ORDER BY id""".stripMargin)),

    // REAL video CONTAINER metadata: synthesize a minimal valid MP4
    // per doc (ftyp + moov/mvhd + trak×k, all pure functions of the
    // id), walk its ISO-BMFF boxes codec-free, emit brand/timescale/
    // duration/track-count — oracle-checked against the closed forms.
    // Narrows the video stub to FRAME decode only.
    Q("multimodal_video_metadata",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        ids.mapPartitions { it =>
          it.map { id =>
            val m = Multimodal.parseMp4Metadata(Multimodal.syntheticMp4(id)).get
            (id, m.brand, m.timescale, m.duration, m.nTracks.toLong,
              m.codecs.mkString(","), m.nKeyframes, m.firstKeyframe)
          }
        }.toDF("id", "brand", "timescale", "duration_ticks", "n_tracks",
            "codecs", "n_keyframes", "first_keyframe")
          .orderBy("id")
      },
      Some("""WITH tr AS (SELECT doc_id, i,
             |    CASE (doc_id + i) % 3 WHEN 0 THEN 'avc1'
             |         WHEN 1 THEN 'hev1' ELSE 'mp4v' END AS codec,
             |    (doc_id*13 + 7*i) % 20 + 1 AS kf
             |  FROM documents,
             |    LATERAL (SELECT unnest(range(1 + doc_id % 3)) AS i) u)
             |SELECT doc_id AS id, 'isom' AS brand,
             |  CAST(1000 AS BIGINT) AS timescale,
             |  CAST((doc_id*97 + 41) % 100000 AS BIGINT) AS duration_ticks,
             |  CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
             |  string_agg(codec, ',' ORDER BY i) AS codecs,
             |  CAST(sum(kf) AS BIGINT) AS n_keyframes,
             |  CAST(doc_id % 5 + 1 AS BIGINT) AS first_keyframe
             |FROM tr GROUP BY doc_id ORDER BY id""".stripMargin)),

    // Container-level video BITRATE profile: per-track frame-size
    // stats from the stsz sample tables (spot broken/padded files
    // before any pixel decode) — still pure-JDK box walking; only
    // bitstream decode remains stubbed. Oracle recomputes the
    // closed-form sample sizes.
    Q("multimodal_video_bitrate",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val ids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        ids.flatMap { id =>
          // tracks without a usable stsz (the parser's degrade path
          // yields an empty array) carry no size stats — skip them
          // rather than crash the task on empty.max
          Multimodal.parseMp4SampleSizes(Multimodal.syntheticMp4(id)).get
            .zipWithIndex.filter(_._1.nonEmpty).map { case (sz, i) =>
              (id, i.toLong, sz.length.toLong, sz.sum, sz.max,
                BigDecimal(sz.sum.toDouble / sz.length)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
        }.toDF("id", "track", "n_samples", "total_bytes", "max_sample",
            "mean_sample")
          .orderBy("id", "track")
      },
      Some("""WITH tr AS (SELECT doc_id, i FROM documents,
             |    LATERAL (SELECT unnest(range(1 + doc_id % 3)) AS i) u),
             |sz AS (SELECT doc_id, i, j,
             |         ((doc_id*7 + i*3 + j*j) % 900) + 100 AS s
             |       FROM tr,
             |    LATERAL (SELECT unnest(range((doc_id*11 + 5*i) % 30 + 2)) AS j) v)
             |SELECT doc_id AS id, CAST(i AS BIGINT) AS track,
             |  count(*) AS n_samples,
             |  CAST(sum(s) AS BIGINT) AS total_bytes,
             |  CAST(max(s) AS BIGINT) AS max_sample,
             |  round(sum(s) / count(*), 4) AS mean_sample
             |FROM sz GROUP BY doc_id, i ORDER BY id, track""".stripMargin)),

    // REAL video PIXEL decode for Motion-JPEG tracks: one MJPEG-in-MP4
    // fixture per doc (a complete JPEG sample in mdat, located via the
    // stsd/stsz/stco tables), decoded through the shared decode
    // dispatch (extractFeatures — the same operator non-video media
    // uses). The JPEG is four constant 8×8 gray quadrants at quality
    // 1.0 — DC-only blocks round-trip bit-exact through the lossy
    // codec — so DuckDB recomputes the decoded mean/std analytically
    // from doc_id without seeing a byte. Pixel decode of predictive
    // codecs (avc1/…) remains the one fenced stub.
    Q("multimodal_mjpeg_frames",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            Multimodal.MediaRow(id, Multimodal.syntheticMjpegMp4(id))))
        Multimodal.extractFeatures(media).toDF()
          .select(col("id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            round(element_at(col("feature"), 1), 6).as("mean_gray"),
            round(element_at(col("feature"), 2), 6).as("std_gray"))
          .orderBy("id")
      },
      Some("""WITH g AS (SELECT doc_id,
             |    (doc_id*31 + 11) % 256 AS g0, (doc_id*37 + 16) % 256 AS g1,
             |    (doc_id*43 + 21) % 256 AS g2, (doc_id*49 + 26) % 256 AS g3
             |  FROM documents),
             |m AS (SELECT doc_id,
             |    CAST(64*(g0+g1+g2+g3) AS DOUBLE)/256 AS mean_g,
             |    CAST(64*(g0*g0+g1*g1+g2*g2+g3*g3) AS DOUBLE)/256 AS meansq_g
             |  FROM g)
             |SELECT doc_id AS id, CAST(16 AS BIGINT) AS width,
             |  CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id""".stripMargin)),

    // MULTI-frame MJPEG decode (r7 item #6): per-KEYFRAME pixel
    // statistics over a 3-or-4-sample MJPEG track (every MJPEG sample
    // is a keyframe), located via the full stsz table + single-chunk
    // stco layout and decoded boundedly (maxFrames 8 — a long clip
    // costs O(maxFrames), never O(track)). Frame f's quadrants are
    // (id·(31+6q) + 11+5q + 29f) mod 256, DC-only exact through the
    // codec, so DuckDB recomputes every frame's mean/std analytically.
    Q("multimodal_mjpeg_multiframe",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val mp4 = Multimodal.syntheticMjpegMp4(id, 3 + (id % 2).toInt)
            Multimodal.decodeMjpegFrames(mp4, 8).map { case (f, w, h, m, sd) =>
              (id, f.toLong, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH fr AS (SELECT doc_id, f FROM documents,
             |    LATERAL (SELECT unnest(range(3 + doc_id % 2)) AS f) u),
             |g AS (SELECT doc_id, f,
             |    (doc_id*31 + 11 + 29*f) % 256 AS g0,
             |    (doc_id*37 + 16 + 29*f) % 256 AS g1,
             |    (doc_id*43 + 21 + 29*f) % 256 AS g2,
             |    (doc_id*49 + 26 + 29*f) % 256 AS g3
             |  FROM fr),
             |m AS (SELECT doc_id, f,
             |    CAST(64*(g0+g1+g2+g3) AS DOUBLE)/256 AS mean_g,
             |    CAST(64*(g0*g0+g1*g1+g2*g2+g3*g3) AS DOUBLE)/256 AS meansq_g
             |  FROM g)
             |SELECT doc_id AS id, CAST(f + 1 AS BIGINT) AS frame,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, frame""".stripMargin)),

    // MPEG-1 INTRA pixel decode (round 12, VERDICT r11 #7): the
    // predictive-codec fence narrowed — a real pure-JVM MPEG-1
    // I-frame decoder (headers, DC/AC VLCs, intra dequant, IDCT;
    // ext/Mpeg1.scala) runs behind the SAME dispatch as images and
    // MJPEG. The fixture re-uses the MJPEG quadrant formula through
    // the new codec (DC-only blocks are exact through dequant+IDCT:
    // pixel = DC/8), so the SAME closed-form oracle covers it. The
    // `decoded` column pins the dispatch: TRUE = real pixels, the
    // fence flag consumers filter on.
    Q("multimodal_mpeg1_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            Multimodal.MediaRow(id, Multimodal.syntheticMpeg1Mp4(id))))
        Multimodal.extractFeatures(media).toDF()
          .select(col("id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            round(element_at(col("feature"), 1), 6).as("mean_gray"),
            round(element_at(col("feature"), 2), 6).as("std_gray"),
            col("decoded"))
          .orderBy("id")
      },
      Some("""WITH g AS (SELECT doc_id,
             |    (doc_id*31 + 11) % 256 AS g0, (doc_id*37 + 16) % 256 AS g1,
             |    (doc_id*43 + 21) % 256 AS g2, (doc_id*49 + 26) % 256 AS g3
             |  FROM documents),
             |m AS (SELECT doc_id,
             |    CAST(64*(g0+g1+g2+g3) AS DOUBLE)/256 AS mean_g,
             |    CAST(64*(g0*g0+g1*g1+g2*g2+g3*g3) AS DOUBLE)/256 AS meansq_g
             |  FROM g)
             |SELECT doc_id AS id, CAST(16 AS BIGINT) AS width,
             |  CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray,
             |  true AS decoded
             |FROM m ORDER BY id""".stripMargin)),

    // Bounded multi-keyframe MPEG-1 walk — the mjpeg_multiframe twin
    // through the new decoder: same per-frame quadrant advance, same
    // analytic oracle, one decoder swap.
    Q("multimodal_mpeg1_frames",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val mp4 = Multimodal.syntheticMpeg1Mp4(id, 3 + (id % 2).toInt)
            Multimodal.decodeMpeg1Frames(mp4, 8).map { case (f, w, h, m, sd) =>
              (id, f.toLong, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH fr AS (SELECT doc_id, f FROM documents,
             |    LATERAL (SELECT unnest(range(3 + doc_id % 2)) AS f) u),
             |g AS (SELECT doc_id, f,
             |    (doc_id*31 + 11 + 29*f) % 256 AS g0,
             |    (doc_id*37 + 16 + 29*f) % 256 AS g1,
             |    (doc_id*43 + 21 + 29*f) % 256 AS g2,
             |    (doc_id*49 + 26 + 29*f) % 256 AS g3
             |  FROM fr),
             |m AS (SELECT doc_id, f,
             |    CAST(64*(g0+g1+g2+g3) AS DOUBLE)/256 AS mean_g,
             |    CAST(64*(g0*g0+g1*g1+g2*g2+g3*g3) AS DOUBLE)/256 AS meansq_g
             |  FROM g)
             |SELECT doc_id AS id, CAST(f + 1 AS BIGINT) AS frame,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, frame""".stripMargin)),

    // MPEG-1 INTER pixel decode (round 12b): P-pictures with real
    // forward motion compensation — skipped-MB copy, zero-MV coded
    // residuals (non-intra dequant), true ±8 px motion — and
    // B-pictures (forward/backward/interpolated MC against both
    // anchors), decoded pure-JVM (ext/Mpeg1.scala decodeFramesLuma).
    // The fixture is an I → P(residual) → P(motion mix) → B(all four
    // bidirectional modes) elementary stream whose every frame mean
    // is a closed k/16 form of doc_id; the frame_type column pins
    // that frames 2-4 really took the inter paths.
    Q("multimodal_mpeg1_motion",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val es = Multimodal.syntheticMpeg1MotionEs(id)
            Multimodal.decodeMpeg1FramesTyped(es, 8).map {
              case (f, t, w, h, m, _) =>
                (id, f.toLong, t.toString, w.toLong, h.toLong, m)
            }
          })
          .toDF("id", "frame", "frame_type", "width", "height", "m")
          .select(col("id"), col("frame"), col("frame_type"),
            col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH b AS (SELECT doc_id, mb, bb,
             |    ((doc_id*7 + mb*16 + bb*4 + 50) % 200 + 10) AS g
             |  FROM documents,
             |    LATERAL (SELECT unnest(range(4)) AS mb) u,
             |    LATERAL (SELECT unnest(range(4)) AS bb) v),
             |agg AS (SELECT doc_id,
             |    sum(g)/16.0 AS mean_i,
             |    sum(CASE WHEN mb=0 THEN g END)/4.0 AS r00,
             |    sum(CASE WHEN (mb=0 AND bb IN (1,3))
             |             OR (mb=1 AND bb IN (0,2)) THEN g END)/4.0 AS r10,
             |    sum(CASE WHEN (mb=0 AND bb IN (2,3))
             |             OR (mb=2 AND bb IN (0,1)) THEN g END)/4.0 AS r01,
             |    sum(CASE WHEN mb=3 THEN g END)/4.0 AS r11,
             |    -- B frame MB2 is the rounded per-quadrant average of
             |    -- P1's MB2 (blocks g(2,b)+d) against P2's MB2 (P1
             |    -- shifted up 8 px: g(0,2), g(0,3), g(2,0), g(2,1), +d)
             |    max(CASE WHEN mb=2 AND bb=0 THEN g END) AS g20,
             |    max(CASE WHEN mb=2 AND bb=1 THEN g END) AS g21,
             |    max(CASE WHEN mb=2 AND bb=2 THEN g END) AS g22,
             |    max(CASE WHEN mb=2 AND bb=3 THEN g END) AS g23,
             |    max(CASE WHEN mb=0 AND bb=2 THEN g END) AS g02,
             |    max(CASE WHEN mb=0 AND bb=3 THEN g END) AS g03
             |  FROM b GROUP BY doc_id),
             |f AS (SELECT doc_id, 2*(doc_id % 5 + 1) + 1 AS d, agg.*
             |  FROM agg),
             |fr AS (
             |  SELECT doc_id, 1 AS frame, 'I' AS ftype, mean_i AS mean FROM f
             |  UNION ALL
             |  SELECT doc_id, 2, 'P', mean_i + d FROM f
             |  UNION ALL
             |  SELECT doc_id, 3, 'P',
             |    (r00 + r10 + r01 + r11)/4.0 + d + d/4.0 FROM f
             |  UNION ALL
             |  SELECT doc_id, 4, 'B',
             |    ( (r00 + d)                           -- MB0: fwd <- P1
             |    + (r10 + d)                           -- MB1: bwd <- P2
             |    + ( (g20 + g02 + 2*d + 1)//2          -- MB2: Bi rounded
             |      + (g21 + g03 + 2*d + 1)//2          --      quadrants
             |      + (g22 + g20 + 2*d + 1)//2
             |      + (g23 + g21 + 2*d + 1)//2 )/4.0
             |    + (r11 + 2*d)                         -- MB3: fwd + resid
             |    )/4.0 FROM f)
             |SELECT doc_id AS id, CAST(frame AS BIGINT) AS frame,
             |  ftype AS frame_type, CAST(32 AS BIGINT) AS width,
             |  CAST(32 AS BIGINT) AS height, round(mean, 6) AS mean_gray
             |FROM fr ORDER BY id, frame""".stripMargin)),

    // H.264 INTER pixel decode (round 12b): P slices with real
    // quarter-pel list-0 motion compensation — P_L0_16x16, P_Skip,
    // intra refresh — decoded pure-JVM (ext/H264.scala
    // decodeFramesLuma, single-reference subset). The fixture is an
    // I(PCM) → P(copy + intra refresh) → P(±8 px motion with H.264's
    // out-of-plane edge CLAMP) Annex-B stream; every frame mean is a
    // closed k/8 form of doc_id, and frame_type pins the inter path.
    Q("multimodal_avc_motion",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val es = Multimodal.syntheticAvcMotionEs(id)
            Multimodal.decodeAvcFramesTyped(es, 8).map {
              case (f, t, w, h, m, _) =>
                (id, f.toLong, t.toString, w.toLong, h.toLong, m)
            }
          })
          .toDF("id", "frame", "frame_type", "width", "height", "m")
          .select(col("id"), col("frame"), col("frame_type"),
            col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH g AS (SELECT doc_id,
             |    (doc_id*11 + 60) % 180 + 20 AS g00,
             |    (doc_id*11 + 4 + 60) % 180 + 20 AS g01,
             |    (doc_id*11 + 8 + 60) % 180 + 20 AS g02,
             |    (doc_id*11 + 12 + 60) % 180 + 20 AS g03,
             |    (doc_id*11 + 16 + 60) % 180 + 20 AS g10,
             |    (doc_id*11 + 20 + 60) % 180 + 20 AS g11,
             |    (doc_id*11 + 24 + 60) % 180 + 20 AS g12,
             |    (doc_id*11 + 28 + 60) % 180 + 20 AS g13,
             |    doc_id % 15 - 7 AS z
             |  FROM documents),
             |v AS (SELECT g.*,
             |    -- intra refresh: DC predicted from MB0's right edge
             |    -- (8 rows of g01, 8 of g03), + the exact qp-28
             |    -- residual z
             |    ((8*g01 + 8*g03 + 8)//16) + z AS iv
             |  FROM g),
             |fr AS (
             |  SELECT doc_id, 1 AS frame, 'I' AS ftype,
             |    (g00+g01+g02+g03+g10+g11+g12+g13)/8.0 AS mean FROM v
             |  UNION ALL
             |  SELECT doc_id, 2, 'P',
             |    ((g00+g01+g02+g03)/4.0 + iv)/2.0 FROM v
             |  UNION ALL
             |  -- P2: MB0 pulls 8 px from the left (clamped -> flat
             |  -- g00/g02 halves); MB1 pulls 8 px from the right
             |  -- (clamped -> flat intra value)
             |  SELECT doc_id, 3, 'P', ((g00+g02)/2.0 + iv)/2.0 FROM v)
             |SELECT doc_id AS id, CAST(frame AS BIGINT) AS frame,
             |  ftype AS frame_type, CAST(32 AS BIGINT) AS width,
             |  CAST(16 AS BIGINT) AS height, round(mean, 6) AS mean_gray
             |FROM fr ORDER BY id, frame""".stripMargin)),

    // Scene-cut detection (round 10): shot boundaries from the
    // per-keyframe mean-luma deltas of the multiframe decode — the
    // shot-boundary pre-pass of a video curation pipeline (sample per
    // SHOT, not per stride). The quadrant fixture advances +29 mod 256
    // per frame, so every possible delta is one of {+29, −35, −99,
    // −163, −227} (q quadrants wrapping ⇒ (116 − 256q)/4) — threshold
    // 30 flags exactly "≥1 quadrant wrapped", boundary-tie-free, and
    // DuckDB replays the mod arithmetic analytically.
    Q("multimodal_scene_cuts",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val fr = Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val mp4 = Multimodal.syntheticMjpegMp4(id, 3 + (id % 2).toInt)
            Multimodal.decodeMjpegFrames(mp4, 8).map { case (f, _, _, m, _) =>
              (id, f.toLong, m)
            }
          }).toDF("id", "frame", "mean_gray")
        Multimodal.sceneCuts(fr, 30.0).orderBy("id", "frame")
      },
      Some("""WITH fr AS (SELECT doc_id, f FROM documents,
             |    LATERAL (SELECT unnest(range(3 + doc_id % 2)) AS f) u),
             |g AS (SELECT doc_id, f,
             |    (doc_id*31 + 11 + 29*f) % 256 AS g0,
             |    (doc_id*37 + 16 + 29*f) % 256 AS g1,
             |    (doc_id*43 + 21 + 29*f) % 256 AS g2,
             |    (doc_id*49 + 26 + 29*f) % 256 AS g3
             |  FROM fr),
             |m AS (SELECT doc_id, f,
             |    CAST(64*(g0+g1+g2+g3) AS DOUBLE)/256 AS mean_g FROM g),
             |d AS (SELECT doc_id, f, mean_g,
             |        lag(mean_g) OVER (PARTITION BY doc_id ORDER BY f) AS prev
             |      FROM m)
             |SELECT doc_id AS id, CAST(f + 1 AS BIGINT) AS frame,
             |  round(mean_g - prev, 6) AS delta,
             |  (abs(mean_g - prev) >= 30.0) AS is_cut
             |FROM d WHERE prev IS NOT NULL ORDER BY id, frame""".stripMargin)),

    // MJPEG-in-AVI keyframe decode (r8 item #7: the second all-intra
    // container covered with REAL pixel decode): same quadrant frames
    // as the MP4 fixture, carried in a RIFF/AVI movi LIST of '00dc'
    // chunks — one closed-form oracle covers both containers. Frame
    // count 2 + id%3 varies the chunk walk; JPEG sizes are often odd,
    // so RIFF WORD-alignment padding is exercised by construction.
    Q("multimodal_avi_frames",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val avi = Multimodal.syntheticMjpegAvi(id, 2 + (id % 3).toInt)
            Multimodal.decodeAviMjpegFrames(avi, 8).map { case (f, w, h, m, sd) =>
              (id, f.toLong, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH fr AS (SELECT doc_id, f FROM documents,
             |    LATERAL (SELECT unnest(range(2 + doc_id % 3)) AS f) u),
             |g AS (SELECT doc_id, f,
             |    (doc_id*31 + 11 + 29*f) % 256 AS g0,
             |    (doc_id*37 + 16 + 29*f) % 256 AS g1,
             |    (doc_id*43 + 21 + 29*f) % 256 AS g2,
             |    (doc_id*49 + 26 + 29*f) % 256 AS g3
             |  FROM fr),
             |m AS (SELECT doc_id, f,
             |    CAST(64*(g0+g1+g2+g3) AS DOUBLE)/256 AS mean_g,
             |    CAST(64*(g0*g0+g1*g1+g2*g2+g3*g3) AS DOUBLE)/256 AS meansq_g
             |  FROM g)
             |SELECT doc_id AS id, CAST(f + 1 AS BIGINT) AS frame,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, frame""".stripMargin)),

    // H.264 P-slice INTER RESIDUALS under the oracle gate (round 13):
    // I(PCM quadrants, values bounded to [20, 199] so residuals never
    // clip) -> P(zero-MV copy + one DC coefficient per 4x4 block,
    // z_blk = ((id + blk) % 5) - 2). At qp 28 the inter dequant chain
    // is unit-exact (256*z, (256z+32)>>6 = 4z per sample), so every P
    // block is its quadrant value + 4*z_blk and DuckDB replays mean
    // AND std analytically. The z-order 8x8 block groups coincide
    // with the PCM quadrants, so each block's base is a closed form.
    Q("multimodal_avc_pres",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            def q(b: Int): Int = ((id * 11 + 4 * b + 60) % 180).toInt + 20
            val es = graft.ext.H264.encodeIPStream(1, 1,
              _ => graft.ext.H264.Pcm((x, y) => q((y / 8) * 2 + x / 8)),
              Seq(_ => graft.ext.H264.PMoveCoded(0, 0,
                blk => ((id + blk) % 5).toInt - 2)))
            Multimodal.decodeAvcFramesTyped(es, 4).map {
              case (f, t, w, h, m, sd) =>
                (id, f.toLong, t.toString, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "frame_type", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("frame_type"),
            col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH q AS (SELECT doc_id, b,
             |    (doc_id*11 + 4*b + 60) % 180 + 20 AS qv
             |  FROM documents, (SELECT unnest(range(4)) AS b)),
             |i AS (SELECT doc_id,
             |    CAST(sum(qv) AS DOUBLE)/4 AS mean_i,
             |    CAST(sum(qv*qv) AS DOUBLE)/4 AS meansq_i
             |  FROM q GROUP BY doc_id),
             |blk AS (SELECT doc_id, k,
             |    (SELECT qv FROM q WHERE q.doc_id = d.doc_id
             |       AND q.b = k // 4) + 4*((d.doc_id + k) % 5 - 2) AS v
             |  FROM documents d, (SELECT unnest(range(16)) AS k)),
             |p AS (SELECT doc_id,
             |    CAST(sum(v) AS DOUBLE)/16 AS mean_p,
             |    CAST(sum(v*v) AS DOUBLE)/16 AS meansq_p
             |  FROM blk GROUP BY doc_id)
             |SELECT i.doc_id AS id, CAST(f.frame AS BIGINT) AS frame,
             |  f.ftype AS frame_type,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(CASE WHEN f.frame = 1 THEN mean_i ELSE mean_p END, 6)
             |    AS mean_gray,
             |  round(CASE WHEN f.frame = 1
             |    THEN sqrt(meansq_i - mean_i*mean_i)
             |    ELSE sqrt(meansq_p - mean_p*mean_p) END, 6) AS std_gray
             |FROM i JOIN p ON p.doc_id = i.doc_id,
             |  (VALUES (1, 'I'), (2, 'P')) f(frame, ftype)
             |ORDER BY id, frame""".stripMargin)),

    // H.264 P-slice PARTITIONS under the oracle gate (round 13):
    // I(PCM gradient, bounded to [20, 229]) -> P(P_8x8 with
    // quadrant-wise MVs: copy / 4-left / 4-up / both, integer
    // vectors, H.264 edge clamp). Every P pixel is the clamped
    // gradient sample, so DuckDB replays the partitioned MC
    // analytically per pixel (mean + std).
    Q("multimodal_avc_parts",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val base = ((id * 7) % 60).toInt + 20
            val es = graft.ext.H264.encodeIPStream(1, 1,
              _ => graft.ext.H264.Pcm((x, y) => base + 3 * x + 7 * y),
              Seq(_ => graft.ext.H264.P8x8(
                Seq((0, 0), (-16, 0), (0, -16), (-16, -16)))))
            Multimodal.decodeAvcFramesTyped(es, 4).map {
              case (f, t, w, h, m, sd) =>
                (id, f.toLong, t.toString, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "frame_type", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("frame_type"),
            col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH px AS (SELECT doc_id, x, y,
             |    (doc_id*7) % 60 + 20 + 3*x + 7*y AS iv,
             |    (doc_id*7) % 60 + 20
             |      + 3*(CASE WHEN x >= 8 THEN greatest(x - 4, 0) ELSE x END)
             |      + 7*(CASE WHEN y >= 8 THEN greatest(y - 4, 0) ELSE y END) AS pv
             |  FROM documents,
             |    (SELECT unnest(range(16)) AS x), (SELECT unnest(range(16)) AS y)),
             |m AS (SELECT doc_id,
             |    CAST(sum(iv) AS DOUBLE)/256 AS mi,
             |    CAST(sum(iv*iv) AS DOUBLE)/256 AS si,
             |    CAST(sum(pv) AS DOUBLE)/256 AS mp,
             |    CAST(sum(pv*pv) AS DOUBLE)/256 AS sp
             |  FROM px GROUP BY doc_id)
             |SELECT doc_id AS id, CAST(f.frame AS BIGINT) AS frame,
             |  f.ftype AS frame_type,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(CASE WHEN f.frame = 1 THEN mi ELSE mp END, 6) AS mean_gray,
             |  round(CASE WHEN f.frame = 1 THEN sqrt(si - mi*mi)
             |        ELSE sqrt(sp - mp*mp) END, 6) AS std_gray
             |FROM m, (VALUES (1, 'I'), (2, 'P')) f(frame, ftype)
             |ORDER BY id, frame""".stripMargin)),

    // H.264/avc1 keyframe decode (round 12, VERDICT r11 missing #3:
    // the MODERN-codec fence narrowed): the fixture is a REAL avc1
    // track — avcC record (SPS/PPS), 4-byte length-prefixed IDR NAL
    // samples — whose I_PCM macroblocks carry the same quadrant
    // pattern as the MJPEG/MPEG-1 fixtures, decoded by the pure-JVM
    // ext/H264 decoder behind the same dispatch. One closed-form
    // oracle now covers THREE codecs end-to-end.
    Q("multimodal_avc_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.map(id =>
            Multimodal.MediaRow(id, Multimodal.syntheticAvcMp4(id))))
        Multimodal.extractFeatures(media).toDF()
          .select(col("id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            round(element_at(col("feature"), 1), 6).as("mean_gray"),
            round(element_at(col("feature"), 2), 6).as("std_gray"),
            col("decoded"))
          .orderBy("id")
      },
      Some("""WITH g AS (SELECT doc_id,
             |    (doc_id*31 + 11) % 256 AS g0, (doc_id*37 + 16) % 256 AS g1,
             |    (doc_id*43 + 21) % 256 AS g2, (doc_id*49 + 26) % 256 AS g3
             |  FROM documents),
             |m AS (SELECT doc_id,
             |    CAST(64*(g0+g1+g2+g3) AS DOUBLE)/256 AS mean_g,
             |    CAST(64*(g0*g0+g1*g1+g2*g2+g3*g3) AS DOUBLE)/256 AS meansq_g
             |  FROM g)
             |SELECT doc_id AS id, CAST(16 AS BIGINT) AS width,
             |  CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray,
             |  true AS decoded
             |FROM m ORDER BY id""".stripMargin)),

    // Bounded multi-keyframe avc1 walk — the mjpeg/mpeg1 multiframe
    // twin through the H.264 decoder: same per-frame quadrant
    // advance, same analytic oracle, third codec swap.
    Q("multimodal_avc_frames",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val mp4 = Multimodal.syntheticAvcMp4(id, 3 + (id % 2).toInt)
            Multimodal.decodeAvcFrames(mp4, 8).map { case (f, w, h, m, sd) =>
              (id, f.toLong, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH fr AS (SELECT doc_id, f FROM documents,
             |    LATERAL (SELECT unnest(range(3 + doc_id % 2)) AS f) u),
             |g AS (SELECT doc_id, f,
             |    (doc_id*31 + 11 + 29*f) % 256 AS g0,
             |    (doc_id*37 + 16 + 29*f) % 256 AS g1,
             |    (doc_id*43 + 21 + 29*f) % 256 AS g2,
             |    (doc_id*49 + 26 + 29*f) % 256 AS g3
             |  FROM fr),
             |m AS (SELECT doc_id, f,
             |    CAST(64*(g0+g1+g2+g3) AS DOUBLE)/256 AS mean_g,
             |    CAST(64*(g0*g0+g1*g1+g2*g2+g3*g3) AS DOUBLE)/256 AS meansq_g
             |  FROM g)
             |SELECT doc_id AS id, CAST(f + 1 AS BIGINT) AS frame,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, frame""".stripMargin)),

    // Intra_16x16 CAVLC path under the oracle gate (the PCM fixture
    // proves the container+NAL walk; this one proves the entropy
    // decode + integer transform): Annex-B streams whose single
    // macroblock carries one luma-DC coefficient z = (id mod 15) − 7.
    // At qp=28 the dequant chain is EXACT unit-granular — LevelScale
    // 256, shift 2 ⇒ dcY = 64z; inverse transform of a lone DC is
    // (64z+32)>>6 = z — so the decoded frame is uniformly 128+z and
    // DuckDB replays the whole codec analytically.
    Q("multimodal_avc_intra16",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val z = (id % 15).toInt - 7
            val es = graft.ext.H264.encodeIFrame(1, 1,
              _ => graft.ext.H264.I16Dc(z), qp = 28)
            Multimodal.decodeAvcFrames(es, 1).map { case (_, w, h, m, sd) =>
              (id, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "width", "height", "m", "sd")
          .select(col("id"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, CAST(16 AS BIGINT) AS width,
             |  CAST(16 AS BIGINT) AS height,
             |  round(CAST(128 + (doc_id % 15) - 7 AS DOUBLE), 6) AS mean_gray,
             |  round(0.0, 6) AS std_gray
             |FROM documents ORDER BY id""".stripMargin)),

    // Intra_4x4 + in-loop deblocking under the oracle gate (round 13,
    // VERDICT r12 #2): MB0 is I_NxN exercising ALL NINE 4x4
    // prediction modes (flat propagation: block z0 is DC(none) = 128
    // plus a lone dequant-exact DC residual 4c, every other block
    // predicts the same flat A through its own directional formula);
    // MB1 is Intra_16x16 DC predicted from MB0's edge plus z2 — a
    // flat B. The slice enables the loop filter (idc 0), so the
    // x = 16 MB edge runs the bS = 4 STRONG filter (table-independent
    // closed form; internal edges are exact no-ops at |z2| <= 2) and
    // DuckDB replays the whole codec + filter analytically: cols
    // 0..12 = A, 13..18 the six filtered values, 19..31 = B.
    Q("multimodal_avc_intra4",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val c = (id % 5).toInt + 1
            val z2 = (id % 5).toInt - 2
            val es = graft.ext.H264.encodeIFrame(2, 1, {
              case 0 => graft.ext.H264.I4x4(
                blk => blk match {
                  case 0 => 2 // DC (no neighbors -> 128)
                  case 1 | 4 | 5 => 1 // H (row 0)
                  case 2 | 8 | 10 => 0 // V (col 0)
                  case 3 => 3; case 6 => 4; case 7 => 5 // DDL DDR VR
                  case 9 => 6; case 12 => 7; case 13 => 8 // HD VL HU
                  case _ => 4 // DDR
                },
                blk => if (blk == 0) c else 0)
              case _ => graft.ext.H264.I16Dc(z2, pred = 2)
            }, qp = 28, deblock = true)
            Multimodal.decodeAvcFrames(es, 1).map { case (_, w, h, m, sd) =>
              (id, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "width", "height", "m", "sd")
          .select(col("id"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id")
      },
      Some("""WITH g AS (SELECT doc_id,
             |    128 + 4*((doc_id % 5) + 1) AS a,
             |    128 + 4*((doc_id % 5) + 1) + (doc_id % 5) - 2 AS b
             |  FROM documents),
             |cols AS (SELECT doc_id, a, b,
             |    (7*a + b + 4)//8 AS c13, (3*a + b + 2)//4 AS c14,
             |    (5*a + 3*b + 4)//8 AS c15, (5*b + 3*a + 4)//8 AS c16,
             |    (3*b + a + 2)//4 AS c17, (7*b + a + 4)//8 AS c18
             |  FROM g),
             |m AS (SELECT doc_id,
             |    CAST(13*a + 13*b + c13 + c14 + c15 + c16 + c17 + c18
             |      AS DOUBLE)/32 AS mean_g,
             |    CAST(13*a*a + 13*b*b + c13*c13 + c14*c14 + c15*c15
             |      + c16*c16 + c17*c17 + c18*c18 AS DOUBLE)/32 AS meansq_g
             |  FROM cols)
             |SELECT doc_id AS id, CAST(32 AS BIGINT) AS width,
             |  CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id""".stripMargin)),

    // HEVC intra decode under the oracle gate (round 14; EXTENDED
    // round 15 with the residual + angular paths, VERDICT r14 #3/#5):
    // one 16-px CTU quadtree-split into four 8x8 CUs — two I_PCM flat
    // quadrants, one VERTICAL (mode 26) CU copying q0's bottom row
    // (its left refs substitute to the same flat value, so the
    // boundary filter is a no-op), and one DC CU carrying a CODED
    // DC coefficient c: prediction dc = (q0 + q1 + 1) // 2 over the
    // flat refs (left = the mode-26 quadrant = q0, top = q1), the
    // 8.4.4.2.5 boundary smoothing, then +2c per sample (8x8 dequant
    // at qp 28 + the two DCT stages are exactly 2c for these
    // magnitudes). The slice is CABAC-coded through the shared 9.3
    // engine including the residual chain (last position, sig map,
    // greater1/2, sign, remaining), so a single bin decoded
    // differently breaks the hash. DuckDB replays the 256-pixel
    // distribution analytically.
    Q("multimodal_hevc_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            def q(k: Int): Int = ((id * 11 + 4 * k + 60) % 180).toInt + 20
            val c0 = (id % 9).toInt - 4
            val c = if (c0 == 0) 5 else c0
            // round 16: chroma DCs ride the same coded CU — PCM CUs
            // carry flat (q0, q1) chroma so the DM-DC prediction of
            // CU3's chroma is closed-form like its luma
            val cbc = (id % 7).toInt - 3
            val crc = ((id / 2) % 7).toInt - 3
            val es = graft.ext.Hevc.encodeIFrame(1, 1, _ =>
              graft.ext.Hevc.Quad(Seq(
                graft.ext.Hevc.HPcm((_, _) => q(0),
                  (_, _) => q(0), (_, _) => q(1)),
                graft.ext.Hevc.HPcm((_, _) => q(1),
                  (_, _) => q(1), (_, _) => q(0)),
                graft.ext.Hevc.HIntra(26),
                graft.ext.Hevc.HIntraCoded(1, Seq((0, c)),
                  cbDc = cbc, crDc = crc))))
            val (w, h, luma, cbP, crP) = graft.ext.Hevc
              .decodeFramesYuv(es, 1).headOption
              .getOrElse((0, 0, Array.empty[Int], Array.empty[Int],
                Array.empty[Int]))
            def stats(p: Array[Int]): (Double, Double) = {
              var sum = 0.0
              var sq = 0.0
              p.foreach { v => sum += v; sq += v.toDouble * v }
              val n = math.max(1, p.length)
              val mean = sum / n
              (mean, math.sqrt(math.max(0.0, sq / n - mean * mean)))
            }
            val (my, sy) = stats(luma)
            val (mu, su) = stats(cbP)
            val (mvv, sv) = stats(crP)
            (id, w.toLong, h.toLong, my, sy, mu, su, mvv, sv)
          })
          .toDF("id", "width", "height", "m", "sd", "mu", "su", "mv", "sv")
          .select(col("id"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"),
            round(col("mu"), 6).as("mean_u"), round(col("su"), 6).as("std_u"),
            round(col("mv"), 6).as("mean_v"), round(col("sv"), 6).as("std_v"))
          .orderBy("id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    (doc_id*11 + 60) % 180 + 20 AS q0,
             |    (doc_id*11 + 64) % 180 + 20 AS q1,
             |    CASE WHEN doc_id % 9 = 4 THEN 5
             |         ELSE doc_id % 9 - 4 END AS c,
             |    (doc_id % 7) - 3 AS cbc,
             |    ((doc_id // 2) % 7) - 3 AS crc
             |  FROM documents),
             |d AS (SELECT doc_id, q0, q1, c, cbc, crc,
             |    (q0 + q1 + 1) // 2 AS dc FROM p),
             |cells(doc_id, cnt, v) AS (
             |  SELECT doc_id, 64, q0 FROM d
             |  UNION ALL SELECT doc_id, 64, q1 FROM d
             |  UNION ALL SELECT doc_id, 64, q0 FROM d
             |  UNION ALL SELECT doc_id, 1,
             |    (q0 + 2*dc + q1 + 2) // 4 + 2*c FROM d
             |  UNION ALL SELECT doc_id, 7, (q1 + 3*dc + 2) // 4 + 2*c FROM d
             |  UNION ALL SELECT doc_id, 7, (q0 + 3*dc + 2) // 4 + 2*c FROM d
             |  UNION ALL SELECT doc_id, 49, dc + 2*c FROM d),
             |m AS (SELECT doc_id,
             |    CAST(sum(cnt*v) AS DOUBLE)/256 AS mean_g,
             |    CAST(sum(cnt*v*v) AS DOUBLE)/256 AS meansq_g
             |  FROM cells GROUP BY doc_id),
             |ccells(doc_id, comp, cnt, v) AS (
             |  -- chroma 8x8: PCM quadrants flat; CU2 (DM vertical)
             |  -- copies CU0's bottom row; CU3 (DM DC) averages CU2's
             |  -- right column and CU1's bottom row (no smoothing for
             |  -- chroma) + the 4c dequant chain at QPc(28) = 28
             |  SELECT doc_id, 'u', 16, q0 FROM d
             |  UNION ALL SELECT doc_id, 'u', 16, q1 FROM d
             |  UNION ALL SELECT doc_id, 'u', 16, q0 FROM d
             |  UNION ALL SELECT doc_id, 'u', 16,
             |    (4*q0 + 4*q1 + 4) // 8 + 4*cbc FROM d
             |  UNION ALL SELECT doc_id, 'v', 16, q1 FROM d
             |  UNION ALL SELECT doc_id, 'v', 16, q0 FROM d
             |  UNION ALL SELECT doc_id, 'v', 16, q1 FROM d
             |  UNION ALL SELECT doc_id, 'v', 16,
             |    (4*q1 + 4*q0 + 4) // 8 + 4*crc FROM d),
             |cm AS (SELECT doc_id,
             |    CAST(sum(CASE WHEN comp = 'u' THEN cnt*v END) AS DOUBLE)/64 AS mean_u,
             |    CAST(sum(CASE WHEN comp = 'u' THEN cnt*v*v END) AS DOUBLE)/64 AS msq_u,
             |    CAST(sum(CASE WHEN comp = 'v' THEN cnt*v END) AS DOUBLE)/64 AS mean_v,
             |    CAST(sum(CASE WHEN comp = 'v' THEN cnt*v*v END) AS DOUBLE)/64 AS msq_v
             |  FROM ccells GROUP BY doc_id)
             |SELECT m.doc_id AS id, CAST(16 AS BIGINT) AS width,
             |  CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray,
             |  round(mean_u, 6) AS mean_u,
             |  round(sqrt(msq_u - mean_u*mean_u), 6) AS std_u,
             |  round(mean_v, 6) AS mean_v,
             |  round(sqrt(msq_v - mean_v*mean_v), 6) AS std_v
             |FROM m JOIN cm ON cm.doc_id = m.doc_id ORDER BY id""".stripMargin)),

    // HEVC in-loop DEBLOCKING + SAO under the oracle gate (round 16,
    // VERDICT r15 #4): a 32x16 two-CTU picture with a flat step of
    // d = 1..5 across the CU edge, decoded three ways — no filter,
    // deblock, and deblock + a band-offset SAO window at a's band
    // (the luma samples still in that band after deblocking shift
    // by +2, replayed generically in SQL by the band test). At qp 28 (beta 18, tc 2) d <= 4 takes the
    // STRONG branch (3 samples a side, hand formulas), d = 5 the
    // WEAK branch (delta clip 2, dEp1/dEq1 side taps); chroma rides
    // the 16-grid edge with the p0/q0-only filter. DuckDB replays
    // every branch in closed form over the per-column value counts.
    Q("multimodal_hevc_deblock",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val a = ((id * 7) % 160).toInt + 40
            val d = (id % 5).toInt + 1
            val b = a + d
            def mk(deblock: Boolean) = graft.ext.Hevc.encodeIFrame(2, 1, {
              case 0 => graft.ext.Hevc.Leaf(graft.ext.Hevc.HPcm(
                (_, _) => a, (_, _) => a, (_, _) => a))
              case _ => graft.ext.Hevc.Leaf(graft.ext.Hevc.HPcm(
                (_, _) => b, (_, _) => b, (_, _) => b))
            }, deblock = deblock)
            // 'sao' = deblock + a one-band +2 window at a's band
            // (8.7.3 over the deblocked picture)
            def mkSao = graft.ext.Hevc.encodeIFrame(2, 1, {
              case 0 => graft.ext.Hevc.Leaf(graft.ext.Hevc.HPcm(
                (_, _) => a, (_, _) => a, (_, _) => a))
              case _ => graft.ext.Hevc.Leaf(graft.ext.Hevc.HPcm(
                (_, _) => b, (_, _) => b, (_, _) => b))
            }, deblock = true,
              sao = Some(graft.ext.Hevc.HSaoBand(Seq(2, 0, 0, 0), a >> 3)))
            Seq(("off", mk(false)), ("on", mk(true)),
              ("sao", mkSao)).map { case (vn, es) =>
              val (w, h, luma, cbP, crP) =
                graft.ext.Hevc.decodeFramesYuv(es, 1).head
              def stats(p: Array[Int]): (Double, Double) = {
                var sum = 0.0; var sq = 0.0
                p.foreach { v => sum += v; sq += v.toDouble * v }
                val n = math.max(1, p.length)
                val mean = sum / n
                (mean, math.sqrt(math.max(0.0, sq / n - mean * mean)))
              }
              val (my, sy) = stats(luma)
              val (mu, _) = stats(cbP)
              val (mvv, _) = stats(crP)
              (id, vn, w.toLong, h.toLong, my, sy, mu, mvv)
            }
          })
          .toDF("id", "filter", "width", "height", "m", "sd", "mu", "mv")
          .select(col("id"), col("filter"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"),
            round(col("sd"), 6).as("std_gray"),
            round(col("mu"), 6).as("mean_u"),
            round(col("mv"), 6).as("mean_v"))
          .orderBy("id", "filter")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    (doc_id*7) % 160 + 40 AS a,
             |    (doc_id % 5) + 1 AS d
             |  FROM documents),
             |-- per-row luma column values after the filter: 13x a,
             |-- then (p2', p1', p0', q0', q1', q2'), then 13x b
             |f AS (SELECT doc_id, a, d, a + d AS b,
             |    CASE WHEN d <= 4 THEN (7*a + (a+d) + 4) // 8 ELSE a END AS p2f,
             |    CASE WHEN d <= 4 THEN (3*a + (a+d) + 2) // 4
             |         ELSE a + 1 END AS p1f,
             |    CASE WHEN d <= 4 THEN (5*a + 3*(a+d) + 4) // 8
             |         ELSE a + 2 END AS p0f,
             |    CASE WHEN d <= 4 THEN (5*(a+d) + 3*a + 4) // 8
             |         ELSE a + d - 2 END AS q0f,
             |    CASE WHEN d <= 4 THEN (3*(a+d) + a + 2) // 4
             |         ELSE a + d - 1 END AS q1f,
             |    CASE WHEN d <= 4 THEN (7*(a+d) + a + 4) // 8
             |         ELSE a + d END AS q2f,
             |    -- chroma: delta = clip2(((d<<2) + 4) // 8)
             |    least(2, (4*d + 4) // 8) AS dc
             |  FROM p),
             |onc(doc_id, a, cnt, v) AS (
             |  SELECT doc_id, a, 13, a FROM f
             |  UNION ALL SELECT doc_id, a, 1, p2f FROM f
             |  UNION ALL SELECT doc_id, a, 1, p1f FROM f
             |  UNION ALL SELECT doc_id, a, 1, p0f FROM f
             |  UNION ALL SELECT doc_id, a, 1, q0f FROM f
             |  UNION ALL SELECT doc_id, a, 1, q1f FROM f
             |  UNION ALL SELECT doc_id, a, 1, q2f FROM f
             |  UNION ALL SELECT doc_id, a, 13, b FROM f),
             |cells(doc_id, filter, cnt, v) AS (
             |  SELECT doc_id, 'off', 16, a FROM f
             |  UNION ALL SELECT doc_id, 'off', 16, b FROM f
             |  UNION ALL SELECT doc_id, 'on', cnt, v FROM onc
             |  UNION ALL SELECT doc_id, 'sao', cnt,
             |    v + CASE WHEN v // 8 = a // 8 THEN 2 ELSE 0 END
             |    FROM onc),
             |m AS (SELECT doc_id, filter,
             |    CAST(sum(cnt*v) AS DOUBLE)/32 AS mean_g,
             |    CAST(sum(cnt*v*v) AS DOUBLE)/32 AS meansq_g
             |  FROM cells GROUP BY doc_id, filter),
             |cm AS (SELECT doc_id, 'off' AS filter,
             |    (a + 0.0 + a + d)/2 AS mean_c FROM f
             |  UNION ALL SELECT doc_id, 'on',
             |    CAST(7*a + (a + dc) + ((a+d) - dc) + 7*(a+d)
             |      AS DOUBLE)/16 FROM f
             |  UNION ALL SELECT doc_id, 'sao', -- luma-only SAO
             |    CAST(7*a + (a + dc) + ((a+d) - dc) + 7*(a+d)
             |      AS DOUBLE)/16 FROM f)
             |SELECT m.doc_id AS id, m.filter AS filter,
             |  CAST(32 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray,
             |  round(mean_c, 6) AS mean_u, round(mean_c, 6) AS mean_v
             |FROM m JOIN cm ON cm.doc_id = m.doc_id
             |  AND cm.filter = m.filter
             |ORDER BY id, m.filter""".stripMargin)),

    // HEVC P-SLICE decode under the oracle gate (round 16, VERDICT
    // r15 #7): a 32x16 two-CTU I picture (flat PCM a | b) followed by
    // two P slices over slice-header RPS references — P1: an explicit
    // zero-MV CU with a 16x16-DC residual (+c1 at qp 28) beside a
    // merge-skip CU (A1 inherits the zero motion -> copy); P2: a skip
    // CU (copy of P1) beside an integer-MV +2-sample CU with +c2 on
    // flat content (the shift is invisible on a flat quadrant, the
    // residual is not). DuckDB replays all three frames closed-form;
    // one wrong merge candidate, mvd bin, MC tap or dequant anywhere
    // shifts a quadrant and breaks the hash.
    Q("multimodal_hevc_inter",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val a = ((id * 7) % 170).toInt + 30
            val b = ((id * 13) % 170).toInt + 30
            val c1 = (id % 9).toInt - 4
            val c2 = ((id / 3) % 9).toInt - 4
            val es = graft.ext.Hevc.encodeIPStream(2, 1,
              i => graft.ext.Hevc.Leaf(graft.ext.Hevc.HPcm(
                (_, _) => if (i == 0) a else b)),
              Seq(
                i => if (i == 0) graft.ext.Hevc.HPMv(0, 0, dc = c1)
                else graft.ext.Hevc.HPSkip(0),
                i => if (i == 0) graft.ext.Hevc.HPSkip(0)
                else graft.ext.Hevc.HPMv(8, 0, dc = c2)))
            graft.ext.Hevc.decodeFramesYuv(es, 4).zipWithIndex.map {
              case ((w, h, luma, _, _), fi) =>
                var sum = 0.0
                var sq = 0.0
                luma.foreach { v => sum += v; sq += v.toDouble * v }
                val n = math.max(1, luma.length)
                val mean = sum / n
                (id, (fi + 1).toLong, w.toLong, h.toLong, mean,
                  math.sqrt(math.max(0.0, sq / n - mean * mean)))
            }
          })
          .toDF("id", "frame", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"),
            round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    (doc_id*7) % 170 + 30 AS a,
             |    (doc_id*13) % 170 + 30 AS b,
             |    (doc_id % 9) - 4 AS c1,
             |    ((doc_id // 3) % 9) - 4 AS c2
             |  FROM documents),
             |v(doc_id, frame, va, vb) AS (
             |  SELECT doc_id, 1, a, b FROM p
             |  UNION ALL SELECT doc_id, 2, a + c1, b FROM p
             |  UNION ALL SELECT doc_id, 3, a + c1, b + c2 FROM p),
             |m AS (SELECT doc_id, frame,
             |    (va + vb) / 2.0 AS mean_g,
             |    CAST(va*va + vb*vb AS DOUBLE) / 2.0 AS meansq_g
             |  FROM v)
             |SELECT doc_id AS id, CAST(frame AS BIGINT) AS frame,
             |  CAST(32 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, frame""".stripMargin)),

    // H.264 CHROMA reconstruction under the oracle gate (round 14,
    // VERDICT r13 #3): a 2x1 picture — MB0 = I16Dc(z0, chroma DC +1
    // at tz): at QPc 28 the lone 2x2 DC coefficient adds exactly ±2
    // per quadrant with the tz sign pattern (++++ / left-right /
    // top-bottom / diagonal); MB1 = I_PCM with closed-form chroma
    // ramps (no mod wraps, SQL-replayable). Frame 2 is a zero-MV P
    // copying BOTH planes through the eighth-pel chroma MC path.
    // mean_u/std_u/mean_v/std_v per frame replay analytically.
    Q("multimodal_avc_chroma",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val z0 = (id % 10).toInt - 5
            val tz = (id % 4).toInt
            val a = ((id * 3) % 170).toInt
            val b = ((id * 7) % 170).toInt
            val es = graft.ext.H264.encodeIPStream(2, 1, {
              case 0 => graft.ext.H264.I16Dc(z0, chromaDcTz = tz)
              case _ => graft.ext.H264.Pcm((_, _) => 90,
                (x, y) => a + 5 * x + 7 * y,
                (x, y) => b + 3 * x + 6 * y)
            }, Seq(_ => graft.ext.H264.PMove(0, 0)))
            Multimodal.decodeAvcFramesYuvStats(es, 4).map {
              case (f, t, w, h, my, mu, su, mv0, sv) =>
                (id, f.toLong, t.toString, w.toLong, h.toLong,
                  my, mu, su, mv0, sv)
            }
          })
          .toDF("id", "frame", "frame_type", "width", "height",
            "my", "mu", "su", "mv", "sv")
          .select(col("id"), col("frame"), col("frame_type"),
            col("width"), col("height"),
            round(col("mu"), 6).as("mean_u"), round(col("su"), 6).as("std_u"),
            round(col("mv"), 6).as("mean_v"), round(col("sv"), 6).as("std_v"))
          .orderBy("id", "frame")
      },
      Some("""WITH p AS (SELECT doc_id, (doc_id % 4) AS tz,
             |    (doc_id*3) % 170 AS a, (doc_id*7) % 170 AS b
             |  FROM documents),
             |cells AS (SELECT doc_id, tz, a, b, x, y,
             |    -- MB0: 128 + 2*sign(tz, quadrant)
             |    128 + 2*(CASE tz WHEN 0 THEN 1
             |      WHEN 1 THEN 1 - 2*(x // 4)
             |      WHEN 2 THEN 1 - 2*(y // 4)
             |      ELSE (1 - 2*(x // 4))*(1 - 2*(y // 4)) END) AS u0,
             |    a + 5*x + 7*y AS u1,
             |    128 + 2*(CASE tz WHEN 0 THEN 1
             |      WHEN 1 THEN 1 - 2*(x // 4)
             |      WHEN 2 THEN 1 - 2*(y // 4)
             |      ELSE (1 - 2*(x // 4))*(1 - 2*(y // 4)) END) AS v0,
             |    b + 3*x + 6*y AS v1
             |  FROM p, (SELECT unnest(range(8)) AS x),
             |    (SELECT unnest(range(8)) AS y)),
             |m AS (SELECT doc_id,
             |    CAST(sum(u0 + u1) AS DOUBLE)/128 AS mean_u,
             |    CAST(sum(u0*u0 + u1*u1) AS DOUBLE)/128 AS meansq_u,
             |    CAST(sum(v0 + v1) AS DOUBLE)/128 AS mean_v,
             |    CAST(sum(v0*v0 + v1*v1) AS DOUBLE)/128 AS meansq_v
             |  FROM cells GROUP BY doc_id)
             |SELECT doc_id AS id, CAST(f.frame AS BIGINT) AS frame,
             |  f.ftype AS frame_type,
             |  CAST(32 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_u, 6) AS mean_u,
             |  round(sqrt(meansq_u - mean_u*mean_u), 6) AS std_u,
             |  round(mean_v, 6) AS mean_v,
             |  round(sqrt(meansq_v - mean_v*mean_v), 6) AS std_v
             |FROM m, (VALUES (1, 'I'), (2, 'P')) f(frame, ftype)
             |ORDER BY id, frame""".stripMargin)),

    // H.264 explicit reference reordering under the oracle gate
    // (round 14, VERDICT r13 #8): I(PCM quadrants) -> P1(zero-MV +
    // per-4x4 DC residual, the r13 rule) -> P2 whose list-0
    // modification (op 0, abs_diff 2 -> picNum 0) swaps the I ahead
    // of P1, so its zero-MV copy reproduces the I exactly — without
    // the reorder it would reproduce P1. Frame means/stds replay with
    // per-frame multiplier m in (0, 4, 0).
    Q("multimodal_avc_reorder",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            def q(b: Int): Int = ((id * 11 + 4 * b + 60) % 180).toInt + 20
            val sep = Array[Byte](0, 0, 0, 1)
            val es = sep ++ graft.ext.H264.spsNal(1, 1, maxRef = 2) ++
              sep ++ graft.ext.H264.ppsNal(28) ++
              sep ++ graft.ext.H264.idrNal(1, 1,
                _ => graft.ext.H264.Pcm((x, y) => q((y / 8) * 2 + x / 8)), 28) ++
              sep ++ graft.ext.H264.pNal(1, 1,
                _ => graft.ext.H264.PMoveCoded(0, 0,
                  blk => ((id + blk) % 5).toInt - 2), 28, frameNum = 1) ++
              sep ++ graft.ext.H264.pNal(1, 1,
                _ => graft.ext.H264.PMove(0, 0), 28, frameNum = 2,
                reorder = Seq((0, 1))) ++
              // round 15 (VERDICT r14 #6): P3 self-marks long-term
              // (copies P2 = I pixels), P4 re-codes the residual over
              // the remaining short-term, P5's second list slot is
              // the LONG-TERM P3 that already outlived the window
              sep ++ graft.ext.H264.pNal(1, 1,
                _ => graft.ext.H264.PMove(0, 0), 28, frameNum = 3,
                mmcoOps = Seq(Seq(6, 0))) ++
              sep ++ graft.ext.H264.pNal(1, 1,
                _ => graft.ext.H264.PMoveCoded(0, 0,
                  blk => ((id + blk) % 5).toInt - 2), 28,
                frameNum = 4) ++
              sep ++ graft.ext.H264.pNal(1, 1,
                _ => graft.ext.H264.PMove(0, 0, refIdx = 1), 28,
                frameNum = 5, numRef = 2)
            Multimodal.decodeAvcFramesTyped(es, 8).map {
              case (f, t, w, h, m, sd) =>
                (id, f.toLong, t.toString, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "frame_type", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("frame_type"),
            col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH f(frame, ftype, mult) AS (VALUES (1, 'I', 0),
             |  (2, 'P', 4), (3, 'P', 0), (4, 'P', 0), (5, 'P', 4),
             |  (6, 'P', 0)),
             |blk AS (SELECT doc_id, frame, ftype, k,
             |    (doc_id*11 + 4*(k // 4) + 60) % 180 + 20
             |      + mult*((doc_id + k) % 5 - 2) AS v
             |  FROM documents, f, (SELECT unnest(range(16)) AS k)),
             |m AS (SELECT doc_id, frame, ftype,
             |    CAST(sum(v) AS DOUBLE)/16 AS mean_g,
             |    CAST(sum(v*v) AS DOUBLE)/16 AS meansq_g
             |  FROM blk GROUP BY doc_id, frame, ftype)
             |SELECT doc_id AS id, CAST(frame AS BIGINT) AS frame, ftype AS frame_type,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, frame""".stripMargin)),

    // H.264 B-slice decode under the oracle gate (round 14, VERDICT
    // r13 #2): I(PCM quadrants) -> P(zero-MV + per-4x4 DC residual
    // z_blk) -> B(bipredictive average of both anchors, POC-built
    // lists). P = I + 4*z per block (the r13 inter rule); the B's
    // rounded average collapses exactly: (2*I + 4z + 1) >> 1 =
    // I + 2z. DuckDB replays all three 16-block distributions with
    // per-frame multiplier m in (0, 4, 2).
    Q("multimodal_avc_bslice",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            def q(b: Int): Int = ((id * 11 + 4 * b + 60) % 180).toInt + 20
            val es = graft.ext.H264.encodeIPBStream(1, 1,
              _ => graft.ext.H264.Pcm((x, y) => q((y / 8) * 2 + x / 8)),
              Seq(
                graft.ext.H264.Pf(_ => graft.ext.H264.PMoveCoded(0, 0,
                  blk => ((id + blk) % 5).toInt - 2)),
                graft.ext.H264.Bf(_ => graft.ext.H264.BBi((0, 0), (0, 0)),
                  pocLsb = 1)))
            Multimodal.decodeAvcFramesTyped(es, 4).map {
              case (f, t, w, h, m, sd) =>
                (id, f.toLong, t.toString, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "frame_type", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("frame_type"),
            col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH f(frame, ftype, mult) AS (VALUES (1, 'I', 0),
             |  (2, 'P', 4), (3, 'B', 2)),
             |blk AS (SELECT doc_id, frame, ftype, k,
             |    (doc_id*11 + 4*(k // 4) + 60) % 180 + 20
             |      + mult*((doc_id + k) % 5 - 2) AS v
             |  FROM documents, f, (SELECT unnest(range(16)) AS k)),
             |m AS (SELECT doc_id, frame, ftype,
             |    CAST(sum(v) AS DOUBLE)/16 AS mean_g,
             |    CAST(sum(v*v) AS DOUBLE)/16 AS meansq_g
             |  FROM blk GROUP BY doc_id, frame, ftype)
             |SELECT doc_id AS id, CAST(frame AS BIGINT) AS frame, ftype AS frame_type,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, frame""".stripMargin)),

    // Chroma-aware scene cuts under the oracle gate (round 15,
    // VERDICT r14 #7): three single-MB I_PCM pictures whose LUMA is
    // constant while the chroma planes jump — frame 2 moves Cb by du,
    // frame 3 moves Cr by dv (closed form in doc_id). The luma-only
    // detector sees nothing; sceneCutsYuv flags |dU| / |dV| >= 2.5.
    Q("multimodal_scene_cuts_yuv",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val stats = Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val l = ((id * 11 + 60) % 180).toInt + 20
            val du = (id % 11).toInt - 5
            val dv = (id % 7).toInt - 3
            val sep = Array[Byte](0, 0, 0, 1)
            def idr(u: Int, v: Int) = graft.ext.H264.idrNal(1, 1,
              _ => graft.ext.H264.Pcm((_, _) => l, (_, _) => u,
                (_, _) => v), 28)
            val es = sep ++ graft.ext.H264.spsNal(1, 1) ++
              sep ++ graft.ext.H264.ppsNal(28) ++
              sep ++ idr(100, 140) ++
              sep ++ idr(100 + du, 140) ++
              sep ++ idr(100 + du, 140 + dv)
            Multimodal.decodeAvcFramesYuvStats(es, 4).map {
              case (f, _, _, _, my, mu, _, mv0, _) =>
                (id, f.toLong, my, mu, mv0)
            }
          })
          .toDF("id", "frame", "mean_y", "mean_u", "mean_v")
        Multimodal.sceneCutsYuv(stats, 1.0, 2.5).orderBy("id", "frame")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    doc_id % 11 - 5 AS du, doc_id % 7 - 3 AS dv
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, 2 AS frame, 0.0 AS delta_y,
             |    CAST(du AS DOUBLE) AS delta_u, 0.0 AS delta_v,
             |    abs(du) >= 2.5 AS is_cut FROM p
             |  UNION ALL SELECT doc_id, 3, 0.0, 0.0,
             |    CAST(dv AS DOUBLE), abs(dv) >= 2.5 FROM p)
             |SELECT doc_id AS id, CAST(frame AS BIGINT) AS frame,
             |  round(delta_y, 6) AS delta_y, round(delta_u, 6) AS delta_u,
             |  round(delta_v, 6) AS delta_v, is_cut
             |FROM r ORDER BY id, frame""".stripMargin)),

    // H.264 spatial-direct / B_Skip / B_8x8 decode under the oracle
    // gate (round 15, VERDICT r14 #2): decode order I, P, B, B, B on
    // a 1x1-MB picture. B1 = B_Direct_16x16 with a one-DC-per-4x4
    // residual, B2 = B_8x8 with (L0, L1, Bi, Direct) quadrants, B3 =
    // B_Skip. With no inter MB neighbors the spatial-direct
    // derivation is directZeroPrediction -- both lists, refIdx 0,
    // zero motion -- so every direct/skip block is the rounded
    // average of the two anchors, per-block closed form in DuckDB:
    // vi (PCM quadrant), vp = vi + 4*res (the r13 inter-residual
    // rule at qp 28), direct = (vi + vp + 1) // 2 (+ 4c for B1).
    Q("multimodal_avc_direct",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            def q(b: Int): Int = ((id * 11 + 4 * b + 60) % 180).toInt + 20
            val es = graft.ext.H264.encodeIPBStream(1, 1,
              _ => graft.ext.H264.Pcm((x, y) => q((y / 8) * 2 + x / 8)),
              Seq(
                graft.ext.H264.Pf(_ => graft.ext.H264.PMoveCoded(0, 0,
                  blk => ((id + blk) % 5).toInt - 2)),
                graft.ext.H264.Bf(_ => graft.ext.H264.BDirect(
                  blk => ((id + blk) % 3).toInt - 1), pocLsb = 1),
                graft.ext.H264.Bf(_ => graft.ext.H264.B8x8(Seq(
                  graft.ext.H264.BSubL0(0, 0),
                  graft.ext.H264.BSubL1(0, 0),
                  graft.ext.H264.BSubBi((0, 0), (0, 0)),
                  graft.ext.H264.BSubDirect)), pocLsb = 1),
                graft.ext.H264.Bf(_ => graft.ext.H264.BSkip,
                  pocLsb = 1)))
            Multimodal.decodeAvcFramesTyped(es, 8).map {
              case (f, t, w, h, m, sd) =>
                (id, f.toLong, t.toString, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "frame_type", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("frame_type"),
            col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH blk AS (SELECT doc_id, k,
             |    (doc_id*11 + 4*(k // 4) + 60) % 180 + 20 AS vi,
             |    (doc_id*11 + 4*(k // 4) + 60) % 180 + 20
             |      + 4*((doc_id + k) % 5 - 2) AS vp
             |  FROM documents, (SELECT unnest(range(16)) AS k)),
             |v AS (
             |  SELECT doc_id, k, 1 AS frame, 'I' AS ftype, vi AS v FROM blk
             |  UNION ALL SELECT doc_id, k, 2, 'P', vp FROM blk
             |  UNION ALL SELECT doc_id, k, 3, 'B',
             |    (vi + vp + 1) // 2 + 4*((doc_id + k) % 3 - 1) FROM blk
             |  UNION ALL SELECT doc_id, k, 4, 'B',
             |    CASE WHEN k // 4 = 0 THEN vi WHEN k // 4 = 1 THEN vp
             |         ELSE (vi + vp + 1) // 2 END FROM blk
             |  UNION ALL SELECT doc_id, k, 5, 'B',
             |    (vi + vp + 1) // 2 FROM blk),
             |m AS (SELECT doc_id, frame, ftype,
             |    CAST(sum(v) AS DOUBLE)/16 AS mean_g,
             |    CAST(sum(v*v) AS DOUBLE)/16 AS meansq_g
             |  FROM v GROUP BY doc_id, frame, ftype)
             |SELECT doc_id AS id, CAST(frame AS BIGINT) AS frame,
             |  ftype AS frame_type,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, frame""".stripMargin)),

    // H.264 CABAC P/B decode under the oracle gate (round 15, VERDICT
    // r14 #1): the SAME I-P-B-B-B stream as multimodal_avc_direct but
    // CABAC-entropy-coded (mb_skip_flag, the P/B mb_type trees,
    // sub_mb_type, UEG3 mvds, inter cbp + cat-2 residual blocks,
    // end_of_slice terminates), cabac_init_idc cycling 0/1/2 by
    // doc_id. Pixel semantics are entropy-independent, so DuckDB
    // replays the identical closed form — one bin decoded differently
    // anywhere in any inter slice shifts every later bin and breaks
    // the hash.
    Q("multimodal_avc_cabac_pb",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            def q(b: Int): Int = ((id * 11 + 4 * b + 60) % 180).toInt + 20
            val es = graft.ext.H264.encodeIPBStreamCabac(1, 1,
              _ => graft.ext.H264.Pcm((x, y) => q((y / 8) * 2 + x / 8)),
              Seq(
                graft.ext.H264.Pf(_ => graft.ext.H264.PMoveCoded(0, 0,
                  blk => ((id + blk) % 5).toInt - 2)),
                graft.ext.H264.Bf(_ => graft.ext.H264.BDirect(
                  blk => ((id + blk) % 3).toInt - 1), pocLsb = 1),
                graft.ext.H264.Bf(_ => graft.ext.H264.B8x8(Seq(
                  graft.ext.H264.BSubL0(0, 0),
                  graft.ext.H264.BSubL1(0, 0),
                  graft.ext.H264.BSubBi((0, 0), (0, 0)),
                  graft.ext.H264.BSubDirect)), pocLsb = 1),
                graft.ext.H264.Bf(_ => graft.ext.H264.BSkip,
                  pocLsb = 1)),
              initIdc = (id % 3).toInt)
            Multimodal.decodeAvcFramesTyped(es, 8).map {
              case (f, t, w, h, m, sd) =>
                (id, f.toLong, t.toString, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "frame", "frame_type", "width", "height", "m", "sd")
          .select(col("id"), col("frame"), col("frame_type"),
            col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "frame")
      },
      Some("""WITH blk AS (SELECT doc_id, k,
             |    (doc_id*11 + 4*(k // 4) + 60) % 180 + 20 AS vi,
             |    (doc_id*11 + 4*(k // 4) + 60) % 180 + 20
             |      + 4*((doc_id + k) % 5 - 2) AS vp
             |  FROM documents, (SELECT unnest(range(16)) AS k)),
             |v AS (
             |  SELECT doc_id, k, 1 AS frame, 'I' AS ftype, vi AS v FROM blk
             |  UNION ALL SELECT doc_id, k, 2, 'P', vp FROM blk
             |  UNION ALL SELECT doc_id, k, 3, 'B',
             |    (vi + vp + 1) // 2 + 4*((doc_id + k) % 3 - 1) FROM blk
             |  UNION ALL SELECT doc_id, k, 4, 'B',
             |    CASE WHEN k // 4 = 0 THEN vi WHEN k // 4 = 1 THEN vp
             |         ELSE (vi + vp + 1) // 2 END FROM blk
             |  UNION ALL SELECT doc_id, k, 5, 'B',
             |    (vi + vp + 1) // 2 FROM blk),
             |m AS (SELECT doc_id, frame, ftype,
             |    CAST(sum(v) AS DOUBLE)/16 AS mean_g,
             |    CAST(sum(v*v) AS DOUBLE)/16 AS meansq_g
             |  FROM v GROUP BY doc_id, frame, ftype)
             |SELECT doc_id AS id, CAST(frame AS BIGINT) AS frame,
             |  ftype AS frame_type,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, frame""".stripMargin)),

    // H.264 CABAC I-slice decode under the oracle gate (round 14,
    // VERDICT r13 #1): a 1x2 picture whose slice is CABAC-entropy-
    // coded through the 9.3 arithmetic engine (ctx-modeled mb_type,
    // cbp-free I16 path, cat-0/1/3 residual blocks, end_of_slice
    // terminate) and reconstructed by the SAME shared helpers as
    // CAVLC. MB0 = I16Dc(z0, ac0 = a, chroma DC at tz): pixel math at
    // qp 28 is unit-exact — block 0's four columns carry deltas
    // floor((k*a + 32)/64) for k in (320, 160, -160, -320), i.e.
    // (5, 3, -2, -5) at a = 1 but (-5, -2, 3, 5) at a = -1 (the
    // floor is not odd-symmetric); the other 15 blocks are flat.
    // MB1 = I16Dc(z1) DC-predicts from
    // MB0's flat bottom edge -> 128 + z0 + z1. DuckDB replays the
    // full 512-pixel distribution analytically; a single bin decoded
    // differently anywhere in the slice shifts every later bin and
    // breaks the hash.
    Q("multimodal_avc_cabac",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            val z0 = (id % 10).toInt - 5
            val a = (id % 3).toInt - 1
            val z1 = ((id / 3) % 7).toInt - 3
            val tz = (id % 4).toInt
            val es = graft.ext.H264.encodeIFrameCabac(1, 2, {
              case 0 => graft.ext.H264.I16Dc(z0, ac0 = a, chromaDcTz = tz)
              case _ => graft.ext.H264.I16Dc(z1)
            })
            Multimodal.decodeAvcFrames(es, 1).map { case (_, w, h, m, sd) =>
              (id, w.toLong, h.toLong, m, sd)
            }
          })
          .toDF("id", "width", "height", "m", "sd")
          .select(col("id"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id")
      },
      Some("""WITH p AS (SELECT doc_id,
             |    128 + (doc_id % 10) - 5 AS v0,
             |    (doc_id % 3) - 1 AS a,
             |    128 + (doc_id % 10) - 5 + ((doc_id // 3) % 7) - 3 AS v1
             |  FROM documents),
             |k(kc) AS (VALUES (320), (160), (-160), (-320)),
             |m AS (SELECT doc_id,
             |    CAST(240*v0 + 256*v1 + (SELECT sum(4*(v0 +
             |        CAST(floor((kc*a + 32)/64.0) AS BIGINT))) FROM k)
             |      AS DOUBLE)/512 AS mean_g,
             |    CAST(240*v0*v0 + 256*v1*v1 + (SELECT sum(4*
             |        (v0 + CAST(floor((kc*a + 32)/64.0) AS BIGINT))
             |        * (v0 + CAST(floor((kc*a + 32)/64.0) AS BIGINT)))
             |        FROM k)
             |      AS DOUBLE)/512 AS meansq_g
             |  FROM p)
             |SELECT doc_id AS id, CAST(16 AS BIGINT) AS width,
             |  CAST(32 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq_g - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id""".stripMargin)),

    // H.264 HIGH profile decode under the oracle gate (round 16,
    // VERDICT r15 #2 + #5): a profile-100 stream per doc whose I
    // macroblock is Intra_8x8 (transform_size_8x8_flag = 1) with one
    // DC coefficient per 8x8 quadrant, in TWO variants — flat
    // weights and a seq scaling matrix with a uniform-20 8x8 intra
    // list. At qp 28 the 8x8 DC dequant is 128c (flat) or 160c
    // (w=20), the 8x8 inverse transform of a lone DC is uniform
    // (dq + 32) >> 6, and the 8.3.2 DC prediction chain composes the
    // quadrants: q0 = 128+r0, q1 = q0+r1, q2 = q0+r2,
    // q3 = ((q1+q2+1) >> 1) + r3. DuckDB replays the whole chain in
    // closed form — a wrong scan, dequant weight, transform tap or
    // prediction neighbor anywhere shifts a quadrant and breaks the
    // hash.
    Q("multimodal_avc_high",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        Tables.documents(s, dir).select(col("doc_id")).as[Long]
          .mapPartitions(_.flatMap { id =>
            def c(k: Int): Int = ((id + 7 * k) % 11).toInt - 5
            val mbs = (_: Int) => graft.ext.H264.I8x8(_ => 2, c)
            val variants = Seq(
              ("flat", graft.ext.H264.encodeIFrameHigh(1, 1, mbs,
                transform8x8 = true)),
              ("scaled", graft.ext.H264.encodeIFrameHigh(1, 1, mbs,
                seqScal4 = Seq.fill(6)(Array.fill(16)(16)),
                seqScal8 = Seq.fill(2)(Array.fill(64)(20)),
                transform8x8 = true)),
              // round 16: the same picture CABAC-entropy-coded (ctx
              // 399-401 flag + cat-5 residuals) — pixel semantics are
              // entropy-independent, so the oracle row equals 'flat'
              ("cabac", graft.ext.H264.encodeIFrameHighCabac(1, 1, mbs)),
              // round 16: INTER 8x8 transform — a P frame whose coded
              // 16x16 adds one 8x8-DC per quadrant (2d each) onto the
              // zero-MV copy of the I picture; the row reports the P
              // frame's stats
              ("inter", {
                val sep = Array[Byte](0, 0, 0, 1)
                sep ++ graft.ext.H264.spsNal(1, 1, high = true) ++
                  sep ++ graft.ext.H264.ppsNal(28, transform8x8 = true) ++
                  sep ++ graft.ext.H264.idrNal(1, 1, mbs, 28,
                    t8Pps = true) ++
                  sep ++ graft.ext.H264.pNal(1, 1,
                    _ => graft.ext.H264.PMoveCoded8(0, 0,
                      k => ((id + 3 * k) % 9).toInt - 4),
                    28, frameNum = 1, t8Pps = true)
              }))
            variants.flatMap { case (vn, es) =>
              Multimodal.decodeAvcFrames(es, 2).takeRight(1).map {
                case (_, w, h, m, sd) =>
                  (id, vn, w.toLong, h.toLong, m, sd)
              }
            }
          })
          .toDF("id", "variant", "width", "height", "m", "sd")
          .select(col("id"), col("variant"), col("width"), col("height"),
            round(col("m"), 6).as("mean_gray"), round(col("sd"), 6).as("std_gray"))
          .orderBy("id", "variant")
      },
      Some("""WITH base AS (SELECT doc_id,
             |    (doc_id % 11) - 5 AS c0,
             |    ((doc_id + 7) % 11) - 5 AS c1,
             |    ((doc_id + 14) % 11) - 5 AS c2,
             |    ((doc_id + 21) % 11) - 5 AS c3
             |  FROM documents),
             |v AS (
             |  SELECT doc_id, 'flat' AS variant,
             |    2*c0 AS r0, 2*c1 AS r1, 2*c2 AS r2, 2*c3 AS r3 FROM base
             |  UNION ALL
             |  SELECT doc_id, 'cabac',
             |    2*c0, 2*c1, 2*c2, 2*c3 FROM base
             |  UNION ALL
             |  SELECT doc_id, 'scaled',
             |    CAST(floor((160*c0 + 32)/64.0) AS BIGINT),
             |    CAST(floor((160*c1 + 32)/64.0) AS BIGINT),
             |    CAST(floor((160*c2 + 32)/64.0) AS BIGINT),
             |    CAST(floor((160*c3 + 32)/64.0) AS BIGINT) FROM base),
             |q0t AS (SELECT doc_id, variant,
             |    128 + r0 AS q0, 128 + r0 + r1 AS q1, 128 + r0 + r2 AS q2,
             |    (256 + 2*r0 + r1 + r2 + 1) // 2 + r3 AS q3
             |  FROM v),
             |-- 'inter': the P frame = the flat I picture + 2*d per
             |-- quadrant (zero-MV copy + one 8x8-DC residual each)
             |q AS (SELECT * FROM q0t
             |  UNION ALL SELECT doc_id, 'inter',
             |    q0 + 2*((doc_id % 9) - 4),
             |    q1 + 2*(((doc_id + 3) % 9) - 4),
             |    q2 + 2*(((doc_id + 6) % 9) - 4),
             |    q3 + 2*(((doc_id + 9) % 9) - 4)
             |  FROM q0t WHERE variant = 'flat'),
             |m AS (SELECT doc_id, variant,
             |    (q0 + q1 + q2 + q3) / 4.0 AS mean_g,
             |    CAST(q0*q0 + q1*q1 + q2*q2 + q3*q3 AS DOUBLE) / 4.0 AS meansq
             |  FROM q)
             |SELECT doc_id AS id, variant, CAST(16 AS BIGINT) AS width,
             |  CAST(16 AS BIGINT) AS height,
             |  round(mean_g, 6) AS mean_gray,
             |  round(sqrt(meansq - mean_g*mean_g), 6) AS std_gray
             |FROM m ORDER BY id, variant""".stripMargin)),

    // Binary metadata: byte length + checksum — oracle-checked
    Q("multimodal_metadata",
      (s, dir) => Multimodal.asBinaryTable(
          Tables.documents(s, dir), "doc_id", "text", "text/plain")
        .select(col("id"), col("media_type"), col("n_bytes"), col("checksum"))
        .orderBy("id"),
      Some("""SELECT doc_id AS id, 'text/plain' AS media_type,
             |       CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS checksum
             |FROM documents ORDER BY id""".stripMargin)),

    // Partition-batched feature extraction over non-image binary
    // payloads (exercises the byte-histogram fallback path)
    Q("multimodal_features",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val media = Multimodal.asBinaryTable(
            Tables.documents(s, dir), "doc_id", "text", "text/plain")
          .select(col("id"), col("content")).as[Multimodal.MediaRow]
        Multimodal.extractFeatures(media).toDF()
          .select(col("id"), col("width").cast("long").as("width"),
            round(element_at(col("feature"), 1), 6).as("f0"),
            col("decoded"))
          .orderBy("id")
      }),

    // Frame sampling plumbing: every 2nd 64-byte chunk (non-image
    // chunks → byte-histogram fallback). The emitted chunk count and
    // byte total are pure integer functions of strlen(text), so
    // this row is oracle-checked closed-form (r8 item #7's second
    // half): nc = ceil(L/64) chunks, indices 0,2,4,… sampled, the
    // last chunk short iff 64∤L and sampled iff its index is even.
    Q("multimodal_frames",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val media = Multimodal.asBinaryTable(
            Tables.documents(s, dir), "doc_id", "text", "text/plain")
          .select(col("id"), col("content")).as[Multimodal.MediaRow]
        Multimodal.sampleFrames(media, 64, 2)
          .groupBy("id")
          .agg(count(lit(1)).as("n_frames"), sum(col("frame_bytes")).as("bytes_sampled"))
          .orderBy("id")
      },
      Some("""WITH c AS (SELECT doc_id, strlen(text) AS L,
             |         CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS nc
             |       FROM documents WHERE strlen(text) > 0)
             |SELECT doc_id AS id,
             |  CAST((nc + 1) // 2 AS BIGINT) AS n_frames,
             |  CAST(CASE WHEN (nc - 1) % 2 = 0
             |       THEN ((nc + 1) // 2 - 1) * 64 + (L - (nc - 1) * 64)
             |       ELSE ((nc + 1) // 2) * 64 END AS BIGINT) AS bytes_sampled
             |FROM c ORDER BY id""".stripMargin))
  )
}
