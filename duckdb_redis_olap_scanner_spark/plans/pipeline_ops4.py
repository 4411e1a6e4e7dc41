"""Round-7 pipeline additions: REAL multimodal decode.

The r6 verdict's top task: replace the import-gated decode stubs with
dependency-free numpy decoders for the uncompressed container formats
— 24-bit BI_RGB BMP, binary PPM (P6), and PCM16 WAV — so "multimodal
columns" is a real operator, not a stand-in (see
``operators/multimodal.py`` for the codecs and the synthesis
contract).

Oracle strategy: the payload bytes are synthesized from closed-form
functions of ``doc_id`` (pixel value v_k = (doc_id*7 + k) % 256 in
top-down RGB flat order; sample s_i = ((doc_id*11 + i*97) % 65536) -
32768 interleaved), so DuckDB computes the expected integer statistics
arithmetically while Spark recovers them by genuinely parsing the
container bytes — BMP row padding + bottom-up flip + BGR→RGB, PPM
comment-skipping header parse, RIFF chunk walk with even-padding. The
position-weighted checksum Σ (k+1)·v_k pins the ORDER of the recovered
array, so a decoder that misreads stride/padding/channel order/row
direction cannot hash-match.

Like ``pipeline_ops3``, this module registers after every earlier
module so the driver's least-recently-verified-first gate rotation
keeps its ordering invariants (see ``catalog.registry``).

Reference parity note: the reference engine (C++ DuckDB↔Redis
connector, src/redis_scanner.cpp) has no media path at all — this
module is part of the beyond-reference LLM-pipeline surface the build
brief asks for.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators import multimodal as M
from .catalog import register, table

# Shared SQL fragments for the image oracles (same closed forms as
# operators/multimodal._image_pixels / _image_dims).
_SQL_IMG_DIMS = """
    SELECT doc_id,
           CAST(4 + doc_id % 13 AS INT) AS width,
           CAST(2 + doc_id % 7 AS INT) AS height
    FROM documents
"""

_SQL_IMG_STATS = """
    px AS (
      SELECT doc_id, width, height,
             unnest(range(0, CAST(width AS BIGINT) * height * 3)) AS k
      FROM dims),
    v AS (
      SELECT doc_id, width, height, k, (doc_id * 7 + k) % 256 AS val
      FROM px)
"""


def _sql_image_oracle(n_bytes_expr: str) -> str:
    return f"""
    WITH dims AS ({_SQL_IMG_DIMS}),
    {_SQL_IMG_STATS}
    SELECT doc_id, width, height,
           CAST({n_bytes_expr} AS INT) AS n_bytes,
           CAST(SUM(CASE WHEN k % 3 = 0 THEN val ELSE 0 END) AS BIGINT)
               AS sum_r,
           CAST(SUM(CASE WHEN k % 3 = 1 THEN val ELSE 0 END) AS BIGINT)
               AS sum_g,
           CAST(SUM(CASE WHEN k % 3 = 2 THEN val ELSE 0 END) AS BIGINT)
               AS sum_b,
           CAST(SUM((k + 1) * val) AS BIGINT) AS checksum
    FROM v GROUP BY doc_id, width, height
    """


@register(
    "multimodal_decode_bmp",
    # BMP file size: 54-byte headers + 4-byte-padded BGR rows.
    oracle=_sql_image_oracle(
        "54 + ((width * 3 + 3) // 4) * 4 * height"
    ),
    tags=("multimodal",),
    doc="REAL image decode, no codec library: synthesize a 24-bit "
    "BI_RGB BMP per doc (bottom-up padded BGR rows), then parse it "
    "back in numpy inside mapInPandas — per-channel pixel sums + "
    "position-weighted checksum over the recovered top-down RGB "
    "array. Two chained narrow Arrow maps, payloads never on the "
    "driver (operators/multimodal.decode_bmp).",
)
def multimodal_decode_bmp(spark: SparkSession, sf: str):
    return M.decode_media_pipeline(table(spark, sf, "documents"), "bmp")


@register(
    "multimodal_decode_ppm",
    # PPM file size: "P6\n" + "#synth\n" + "{w} {h}\n" + "255\n" + raw RGB.
    # header = "P6\n" (3) + "#synth\n" (7) + "{w} {h}\n" (digits + 2)
    #          + "255\n" (4) = 16 + digits(w) + digits(h)
    oracle=_sql_image_oracle(
        "16 + length(CAST(width AS VARCHAR)) "
        "+ length(CAST(height AS VARCHAR)) + width * height * 3"
    ),
    tags=("multimodal",),
    doc="REAL image decode of binary PPM (P6): whitespace/comment "
    "header parse + raw RGB extraction in numpy — same recovered "
    "statistics as the BMP twin but through the netpbm parse path "
    "(operators/multimodal.decode_ppm).",
)
def multimodal_decode_ppm(spark: SparkSession, sf: str):
    return M.decode_media_pipeline(table(spark, sf, "documents"), "ppm")


@register(
    "multimodal_decode_wav",
    oracle="""
    WITH prm AS (
      SELECT doc_id,
             CAST(1 + doc_id % 2 AS INT) AS n_channels,
             CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
             CAST(16 + doc_id % 17 AS INT) AS n_frames
      FROM documents),
    sm AS (
      SELECT doc_id, n_channels, sample_rate, n_frames,
             unnest(range(0, CAST(n_frames AS BIGINT) * n_channels)) AS i
      FROM prm),
    v AS (
      SELECT doc_id, n_channels, sample_rate, n_frames, i,
             ((doc_id * 11 + i * 97) % 65536) - 32768 AS s
      FROM sm)
    SELECT doc_id, n_channels, sample_rate,
           CAST(16 AS INT) AS bits, n_frames,
           CAST(SUM(CASE WHEN i % n_channels = 0 THEN s ELSE 0 END)
                AS BIGINT) AS sum_ch0,
           CAST(SUM(CASE WHEN i % n_channels = 1 THEN s ELSE 0 END)
                AS BIGINT) AS sum_ch1,
           CAST(SUM((i + 1) * s) AS BIGINT) AS checksum
    FROM v GROUP BY doc_id, n_channels, sample_rate, n_frames
    """,
    tags=("multimodal",),
    doc="REAL audio decode, no codec library: synthesize a PCM16 "
    "RIFF/WAVE file per doc (fmt chunk + odd-sized LIST chunk the "
    "parser must even-pad over + data chunk), then walk the chunks "
    "and extract the int16 samples in numpy — per-channel sample "
    "sums + position-weighted checksum over the interleaved stream "
    "(operators/multimodal.decode_wav).",
)
def multimodal_decode_wav(spark: SparkSession, sf: str):
    return M.decode_media_pipeline(table(spark, sf, "documents"), "wav")


# ---------------------------------------------------------------------------
# Wordpiece tokenize-to-ids
# ---------------------------------------------------------------------------

from ..operators import retrieval as R  # noqa: E402
from .pipeline_ops import _SQL_TOKS  # noqa: E402


@register(
    "pipeline_tokenize_ids",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, coalesce({_SQL_TOKS}, CAST([] AS VARCHAR[])) AS toks
      FROM documents),
    p AS (
      SELECT DISTINCT doc_id, unnest(list_distinct(toks)) AS tok FROM t),
    vr AS (
      SELECT tok, count(*) AS df FROM p WHERE tok <> ''
      GROUP BY tok ORDER BY df DESC, tok ASC LIMIT {R.OOV_VOCAB_SIZE}),
    vocab AS (
      SELECT tok, CAST(row_number() OVER (ORDER BY df DESC, tok ASC)
                       AS INT) AS id
      FROM vr),
    vw AS (SELECT CAST(count(*) AS INT) AS w FROM vocab),
    ch AS (
      SELECT DISTINCT unnest(list_transform(
          range(1, len(tok) + 1),
          i -> substr(tok, CAST(i AS INT), 1))) AS c
      FROM vocab),
    cl AS (SELECT coalesce(list(c ORDER BY c), CAST([] AS VARCHAR[]))
               AS cl FROM ch),
    wrd AS (
      SELECT doc_id, u.wp, u.w FROM (
        SELECT doc_id, unnest(list_transform(
            range(1, len(toks) + 1),
            i -> {{'wp': i, 'w': toks[CAST(i AS INT)]}})) AS u
        FROM t)
      WHERE u.w <> ''),
    pm AS (
      SELECT wrd.doc_id, wrd.wp, v.id AS bid,
             CAST(len(v.tok) AS INT) AS blen,
             row_number() OVER (PARTITION BY wrd.doc_id, wrd.wp
                                ORDER BY len(v.tok) DESC, v.id ASC) AS rn
      FROM wrd JOIN vocab v ON starts_with(wrd.w, v.tok)),
    best AS (SELECT doc_id, wp, bid, blen FROM pm WHERE rn = 1),
    wb AS (
      SELECT wrd.doc_id, wrd.wp, wrd.w, best.bid,
             coalesce(best.blen, 1) AS skip
      FROM wrd
      LEFT JOIN best ON wrd.doc_id = best.doc_id AND wrd.wp = best.wp),
    px AS (
      -- first_id: the longest word-piece match if any (word id wins
      -- length-1 ties, mirroring the Spark side), else the
      -- word-initial single-char piece, else NULL (-> [UNK]);
      -- cpos: 1-based alphabet positions of the remaining chars,
      -- 0 marking a char outside the vocabulary alphabet.
      SELECT wb.doc_id, wb.wp, vw.w AS vsz,
        CASE WHEN wb.bid IS NOT NULL THEN wb.bid
             WHEN list_position(cl.cl, substr(wb.w, 1, 1)) > 0
             THEN vw.w + 2 * CAST(list_position(
                    cl.cl, substr(wb.w, 1, 1)) AS INT) - 1
        END AS first_id,
        list_transform(
          range(1, len(wb.w) - wb.skip + 1),
          i -> CAST(list_position(cl.cl, substr(
                 wb.w, wb.skip + CAST(i AS INT), 1)) AS INT)) AS cpos
      FROM wb CROSS JOIN vw CROSS JOIN cl),
    pw AS (
      SELECT doc_id, wp,
        CASE WHEN first_id IS NULL
               OR len(list_filter(cpos, x -> x = 0)) > 0
             THEN [0]
             ELSE list_prepend(
               CAST(first_id AS INT),
               list_transform(cpos, pos -> vsz + 2 * pos))
        END AS word_ids
      FROM px),
    seq AS (
      SELECT doc_id, flatten(list(word_ids ORDER BY wp)) AS ids
      FROM pw GROUP BY doc_id)
    SELECT d.doc_id,
      CAST(len(coalesce(seq.ids, CAST([] AS INT[]))) AS INT) AS n_ids,
      CAST(len(list_filter(coalesce(seq.ids, CAST([] AS INT[])),
               x -> x = 0)) AS INT) AS n_unk,
      CAST(list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(coalesce(seq.ids, CAST([] AS INT[])),
                         x -> CAST(x AS BIGINT))),
        (h, x) -> (h * {R.WP_HASH_BASE} + x + 1) % {R.WP_HASH_MOD})
        AS BIGINT) AS ids_hash
    FROM documents d LEFT JOIN seq ON d.doc_id = seq.doc_id
    """,
    tags=("text", "pipeline", "tokenizer"),
    doc="Greedy longest-match wordpiece encode against the corpus's "
    "own induced vocabulary (top-30 df words + char start/## pieces, "
    "[UNK]=0): per-doc id count, UNK count, and an order-pinning "
    "polynomial hash of the exact id sequence. The vocab is a plan "
    "literal, so the Spark side is one narrow codegen stage of "
    "higher-order functions — no shuffle, no Python "
    "(operators/retrieval.wordpiece_encode_stats).",
)
def pipeline_tokenize_ids(spark: SparkSession, sf: str):
    return R.wordpiece_encode_stats(table(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# Extended PII scrub (emails/phones/SSN/IPv4/Luhn-validated CC)
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from ..operators import text as T  # noqa: E402


def _inject_pii_full_col():
    """Deterministic synthetic PII across every class (the generated
    corpus contains none): the r6 email/phone chain, plus independent
    credit-card (one Luhn-VALID dashed, one Luhn-INVALID spaced, one
    valid unseparated), SSN, and IPv4 (one valid, one with an
    out-of-range octet that must NOT match) segments, on coprime
    moduli so docs carry class combinations."""
    base = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com now"),
        ),
    ).when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(
        F.lit("")
    )
    cc = (
        F.when(F.col("doc_id") % 11 == 0, F.lit(" card 4539-1488-0343-6467 ok"))
        .when(F.col("doc_id") % 13 == 0, F.lit(" card 4539 1488 0343 6468 bad"))
        .when(F.col("doc_id") % 23 == 0, F.lit(" acct 4111111111111111"))
        .otherwise(F.lit(""))
    )
    ssn = F.when(
        F.col("doc_id") % 17 == 0, F.lit(" ssn 123-45-6789 here")
    ).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 19 == 0, F.lit(" ip 192.168.10.254 not 999.77.1.1")
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), base, cc, ssn, ip)


_SQL_INJECT_PII_FULL = """
    text
    || CASE
         WHEN doc_id % 5 = 0
           THEN ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail.example.com now'
         WHEN doc_id % 7 = 0 THEN ' call 555-123-4567'
         ELSE '' END
    || CASE
         WHEN doc_id % 11 = 0 THEN ' card 4539-1488-0343-6467 ok'
         WHEN doc_id % 13 = 0 THEN ' card 4539 1488 0343 6468 bad'
         WHEN doc_id % 23 = 0 THEN ' acct 4111111111111111'
         ELSE '' END
    || CASE WHEN doc_id % 17 = 0 THEN ' ssn 123-45-6789 here'
            ELSE '' END
    || CASE WHEN doc_id % 19 = 0 THEN ' ip 192.168.10.254 not 999.77.1.1'
            ELSE '' END
"""


def _sql_luhn_valid(x: str) -> str:
    """The same Luhn fold as operators/text.luhn_valid, in DuckDB SQL:
    doubling odd 1-based positions of the separator-stripped digits,
    subtracting 9 from two-digit doubles, sum % 10 = 0."""
    dg = f"regexp_replace({x}, '[^0-9]', '', 'g')"
    d = f"CAST(substr({dg}, CAST(i AS INT), 1) AS INT)"
    term = (
        f"CASE WHEN i % 2 = 1 THEN "
        f"CASE WHEN 2 * {d} > 9 THEN 2 * {d} - 9 ELSE 2 * {d} END "
        f"ELSE {d} END"
    )
    return (
        f"CAST(list_sum(list_transform(range(1, len({dg}) + 1), "
        f"i -> {term})) AS BIGINT) % 10 = 0"
    )


@register(
    "text_pii_scrub_full",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_SQL_INJECT_PII_FULL} AS text FROM documents),
    c AS (
      SELECT doc_id, text,
             regexp_extract_all(text, '{T.PII_CC_RE}') AS cands
      FROM d),
    v AS (
      SELECT doc_id, text, cands,
             list_filter(cands, x -> {_sql_luhn_valid('x')}) AS valid
      FROM c),
    s AS (
      SELECT doc_id, text, cands, valid,
             list_reduce(
               list_prepend(
                 regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(text,
                     '{T.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                     '{T.PII_PHONE_RE}', '<PHONE>', 'g'),
                     '{T.PII_SSN_RE}', '<SSN>', 'g'),
                     '{T.PII_IP_RE}', '<IP>', 'g'),
                 valid),
               (acc, cc) -> replace(acc, cc, '<CC>')) AS clean
      FROM v)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{T.PII_EMAIL_RE}')) AS INT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{T.PII_PHONE_RE}')) AS INT)
               AS n_phones,
           CAST(len(regexp_extract_all(text, '{T.PII_SSN_RE}')) AS INT)
               AS n_ssn,
           CAST(len(regexp_extract_all(text, '{T.PII_IP_RE}')) AS INT)
               AS n_ip,
           CAST(len(cands) AS INT) AS n_cc_candidates,
           CAST(len(valid) AS INT) AS n_cc_valid,
           md5(clean) AS clean_md5,
           CAST(LENGTH(text) - LENGTH(clean) AS INT) AS len_delta
    FROM s
    """,
    tags=("text", "pipeline"),
    doc="PII redaction across the standard classes: emails, phones, "
    "SSNs, range-validated IPv4, and credit-card numbers gated on a "
    "Luhn integer fold (only valid numbers redacted; candidates "
    "counted separately). Injected fixtures exercise every class "
    "incl. a Luhn-invalid CC and an out-of-range IP octet. Pure "
    "codegen'd regexp + HOF passes, no shuffle "
    "(operators/text.scrub_pii_full).",
)
def text_pii_scrub_full(spark: SparkSession, sf: str):
    docs = table(spark, sf, "documents").withColumn(
        "text", _inject_pii_full_col()
    )
    return T.scrub_pii_full(docs)


# ---------------------------------------------------------------------------
# Feature extraction on decoded media (real pixel/sample math)
# ---------------------------------------------------------------------------


def _sql_gray(xe: str, ye: str) -> str:
    """BT.601 integer grayscale of the synthesized pixel at (x, y):
    same (doc_id*7 + k) % 256 closed form the decode oracles use,
    with k = 3*(y*w + x) + channel."""
    base = f"(doc_id * 7 + 3 * (({ye}) * width + ({xe})))"
    return (
        f"((299 * ({base} % 256) + 587 * (({base} + 1) % 256) "
        f"+ 114 * (({base} + 2) % 256)) // 1000)"
    )


@register(
    "multimodal_image_features",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + doc_id % 13 AS INT) AS width,
             CAST(2 + doc_id % 7 AS INT) AS height,
             CAST((4 + doc_id % 13) // 2 AS INT) AS pw,
             CAST((2 + doc_id % 7) // 2 AS INT) AS ph
      FROM documents),
    gs AS (
      SELECT doc_id,
             CAST(SUM({_sql_gray('k % width', 'k // width')}) AS BIGINT)
                 AS gray_sum
      FROM (SELECT doc_id, width,
                   unnest(range(0, CAST(width AS BIGINT) * height)) AS k
            FROM dims)
      GROUP BY doc_id),
    pv AS (
      SELECT doc_id, q,
             ({_sql_gray('2 * (q % pw)', '2 * (q // pw)')}
              + {_sql_gray('2 * (q % pw) + 1', '2 * (q // pw)')}
              + {_sql_gray('2 * (q % pw)', '2 * (q // pw) + 1')}
              + {_sql_gray('2 * (q % pw) + 1', '2 * (q // pw) + 1')}
             ) // 4 AS pooled
      FROM (SELECT doc_id, width, pw,
                   unnest(range(0, CAST(pw AS BIGINT) * ph)) AS q
            FROM dims)),
    ps AS (
      SELECT doc_id,
             CAST(SUM(pooled) AS BIGINT) AS pooled_sum,
             CAST(SUM((q + 1) * pooled) AS BIGINT) AS pooled_checksum
      FROM pv GROUP BY doc_id)
    SELECT d.doc_id, d.pw AS pooled_w, d.ph AS pooled_h,
           gs.gray_sum, ps.pooled_sum, ps.pooled_checksum
    FROM dims d
    JOIN gs ON d.doc_id = gs.doc_id
    JOIN ps ON d.doc_id = ps.doc_id
    """,
    tags=("multimodal",),
    doc="Real pixel math ON the decoded image: BT.601 integer "
    "grayscale and 2x2 truncating average pool over the recovered "
    "RGB array (vision-preprocessing downsample), with a "
    "position-weighted pooled checksum pinning the pooling geometry. "
    "One more numpy step in the same narrow Arrow map as the decode "
    "(operators/multimodal.image_features).",
)
def multimodal_image_features(spark: SparkSession, sf: str):
    return M.image_features(
        M.synthesize_media(table(spark, sf, "documents"), "bmp")
    )


def _sql_abs_s(je: str) -> str:
    """|sample| of channel-0 sample j: interleaved index i = j*ch."""
    return (
        f"abs(((doc_id * 11 + (({je}) * n_channels) * 97) % 65536) - 32768)"
    )


@register(
    "multimodal_audio_energy",
    oracle=f"""
    WITH prm AS (
      SELECT doc_id,
             CAST(1 + doc_id % 2 AS INT) AS n_channels,
             CAST(16 + doc_id % 17 AS INT) AS f,
             CAST(CASE WHEN 16 + doc_id % 17 >= {M.AUDIO_FRAME_WIN}
                  THEN (16 + doc_id % 17 - {M.AUDIO_FRAME_WIN})
                       // {M.AUDIO_FRAME_HOP} + 1
                  ELSE 0 END AS INT) AS nw
      FROM documents),
    ta AS (
      SELECT doc_id, CAST(SUM({_sql_abs_s('j')}) AS BIGINT) AS total_abs
      FROM (SELECT doc_id, n_channels,
                   unnest(range(0, CAST(f AS BIGINT))) AS j
            FROM prm)
      GROUP BY doc_id),
    en AS (
      SELECT doc_id, jw,
             SUM({_sql_abs_s(f'jw * {M.AUDIO_FRAME_HOP} + t')}) AS energy
      FROM (SELECT doc_id, n_channels, jw,
                   unnest(range(0, {M.AUDIO_FRAME_WIN})) AS t
            FROM (SELECT doc_id, n_channels,
                         unnest(range(0, CAST(nw AS BIGINT))) AS jw
                  FROM prm))
      GROUP BY doc_id, jw),
    ec AS (
      SELECT doc_id,
             CAST(SUM((jw + 1) * energy) AS BIGINT) AS energy_checksum
      FROM en GROUP BY doc_id)
    SELECT p.doc_id, p.f AS n_ch0, p.nw AS n_win, ta.total_abs,
           coalesce(ec.energy_checksum, 0) AS energy_checksum
    FROM prm p
    JOIN ta ON p.doc_id = ta.doc_id
    LEFT JOIN ec ON p.doc_id = ec.doc_id
    """,
    tags=("multimodal",),
    doc="Real sample math ON the decoded PCM: short-time energy — "
    "channel 0 framed (win 8, hop 4, full windows), per-frame "
    "sum of |sample|, frame-order-weighted checksum pinning the hop "
    "geometry — the framing primitive under RMS/VAD/fbank features "
    "(operators/multimodal.audio_frame_energy).",
)
def multimodal_audio_energy(spark: SparkSession, sf: str):
    return M.audio_frame_energy(
        M.synthesize_media(table(spark, sf, "documents"), "wav")
    )
