"""DuckDB oracle SQL (ANSI) — multimodal family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

ORACLES: dict[str, str] = {
    "multimodal_media_summary": """
        SELECT source, count(*) AS n_media,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               count(DISTINCT md5(text)) AS distinct_payloads
        FROM documents GROUP BY source ORDER BY source
    """,
    "multimodal_image_decode": """
        -- The Spark side synthesizes GENUINE png/bmp/gif/jpeg container
        -- bytes from doc_id and decodes them with the REAL stdlib-struct
        -- header parsers (no fakes on that path); the oracle replicates
        -- the construction arithmetic, pinning every decoded width/
        -- height/bit-depth/channel/byte value end-to-end.  Container
        -- sizes fixed by construction: png 33 B, bmp 54 B, gif 13 B,
        -- jpeg 39 B (SOI + APP0/JFIF + SOF0).
        SELECT fmt AS format, count(*) AS n_images,
               CAST(sum(w) AS BIGINT) AS sum_width,
               CAST(sum(h) AS BIGINT) AS sum_height,
               CAST(sum(nbytes) AS BIGINT) AS sum_bytes,
               min(bd) AS bit_depth, min(ch) AS channels
        FROM (
            SELECT CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
                        WHEN 2 THEN 'gif' ELSE 'jpeg' END AS fmt,
                   16 + doc_id % 64 AS w,
                   16 + (doc_id * 7) % 48 AS h,
                   CASE doc_id % 4 WHEN 0 THEN 33 WHEN 1 THEN 54
                        WHEN 2 THEN 13 ELSE 39 END AS nbytes,
                   CASE doc_id % 4 WHEN 1 THEN 24 ELSE 8 END AS bd,
                   CASE doc_id % 4 WHEN 0 THEN 4 ELSE 3 END AS ch
            FROM documents
        ) GROUP BY fmt ORDER BY format
    """,
    "multimodal_bmp_pixel_decode": """
        -- The Spark side synthesizes GENUINE uncompressed 24-bit BMPs —
        -- headers AND pixel arrays, stride-padded — from doc_id and
        -- decodes the pixel payloads with the REAL stdlib-struct+numpy
        -- path (no PIL anywhere); the oracle replicates the
        -- construction's closed-form pixel byte (doc_id+3x+5y+11c)%256
        -- per BGR channel, pinning every channel sum and byte extremum
        -- of every image end-to-end.
        WITH geo AS (
            SELECT doc_id, 4 + doc_id % 12 AS w, 4 + (doc_id * 7) % 8 AS h
            FROM documents
        ), px AS (
            SELECT g.doc_id, g.w, g.h,
                   (g.doc_id + 3*xs.x + 5*ys.y) % 256 AS b,
                   (g.doc_id + 3*xs.x + 5*ys.y + 11) % 256 AS gg,
                   (g.doc_id + 3*xs.x + 5*ys.y + 22) % 256 AS r
            FROM geo g,
                 unnest(generate_series(0, g.w - 1)) xs(x),
                 unnest(generate_series(0, g.h - 1)) ys(y)
        )
        SELECT doc_id AS media_id,
               CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
               count(*) AS n_pixels,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum(gg) AS BIGINT) AS sum_g,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(least(min(b), min(gg), min(r)) AS INT) AS min_byte,
               CAST(greatest(max(b), max(gg), max(r)) AS INT) AS max_byte
        FROM px GROUP BY doc_id ORDER BY media_id
    """,
    "multimodal_png_pixel_decode": """
        -- The Spark side synthesizes GENUINE 8-bit RGB PNGs — magic,
        -- IHDR, a VALID zlib IDAT (stored-mode deflate, HOF-computed
        -- adler32) with ALL FIVE spec scanline filters (None/Sub/Up/
        -- Average/Paeth, cycling y % 5) — and decodes them with the
        -- REAL stdlib zlib+numpy path (inflate verifies the checksum,
        -- the unfilter reconstructs raw bytes sequentially where the
        -- predictor demands it); the
        -- oracle replicates the construction's closed-form RAW pixel
        -- byte (doc_id + 7j + 13y) % 256 with j = 3x + channel,
        -- pinning every channel sum and byte extremum end-to-end.
        WITH geo AS (
            SELECT doc_id, 4 + doc_id % 12 AS w, 4 + (doc_id * 7) % 8 AS h
            FROM documents
        ), px AS (
            SELECT g.doc_id, g.w, g.h,
                   (g.doc_id + 21*xs.x + 13*ys.y) % 256 AS r,
                   (g.doc_id + 21*xs.x + 13*ys.y + 7) % 256 AS gg,
                   (g.doc_id + 21*xs.x + 13*ys.y + 14) % 256 AS b
            FROM geo g,
                 unnest(generate_series(0, g.w - 1)) xs(x),
                 unnest(generate_series(0, g.h - 1)) ys(y)
        )
        SELECT doc_id AS media_id,
               CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
               count(*) AS n_pixels,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum(gg) AS BIGINT) AS sum_g,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(least(min(b), min(gg), min(r)) AS INT) AS min_byte,
               CAST(greatest(max(b), max(gg), max(r)) AS INT) AS max_byte
        FROM px GROUP BY doc_id ORDER BY media_id
    """,
    "multimodal_png_palette_decode": """
        -- The Spark side synthesizes GENUINE color-type-3 (palette)
        -- PNGs — 16-entry PLTE with real CRC, valid zlib IDAT, all
        -- five scanline filters at bpp = 1 — and decodes them with the
        -- REAL stdlib path (chunk walk collects PLTE, inflate verifies
        -- adler32, generalized unfilter, palette map); the oracle
        -- replicates the construction's index (doc_id + 7x + 13y) % 16
        -- and palette entry ((3 doc_id + 17 i) % 256, +29, +58),
        -- pinning every channel sum and byte extremum end-to-end.
        WITH geo AS (
            SELECT doc_id, 4 + doc_id % 12 AS w, 4 + (doc_id * 7) % 8 AS h
            FROM documents
        ), px AS (
            SELECT g.doc_id, g.w, g.h,
                   (g.doc_id + 7*xs.x + 13*ys.y) % 16 AS ix
            FROM geo g,
                 unnest(generate_series(0, g.w - 1)) xs(x),
                 unnest(generate_series(0, g.h - 1)) ys(y)
        ), rgb AS (
            SELECT doc_id, w, h,
                   (3*doc_id + 17*ix) % 256 AS r,
                   (3*doc_id + 17*ix + 29) % 256 AS gg,
                   (3*doc_id + 17*ix + 58) % 256 AS b
            FROM px
        )
        SELECT doc_id AS media_id,
               CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
               count(*) AS n_pixels,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum(gg) AS BIGINT) AS sum_g,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(least(min(b), min(gg), min(r)) AS INT) AS min_byte,
               CAST(greatest(max(b), max(gg), max(r)) AS INT) AS max_byte
        FROM rgb GROUP BY doc_id ORDER BY media_id
    """,
    "multimodal_gif_pixel_decode": """
        -- The Spark side synthesizes GENUINE single-frame GIF89a
        -- images (128-entry global color table, clear-interleaved LZW
        -- stream at min code size 7 — the spec-legal 'uncompressed
        -- GIF' encoding — split across data sub-blocks) and decodes
        -- them with the REAL stdlib path: container walk, sub-block
        -- reassembly, the GENUINE variable-width LZW algorithm, and
        -- the palette map.  The oracle replicates the construction's
        -- index (doc_id + 7x + 13y) % 16 and palette entry
        -- ((3 doc_id + 17 i) % 256, +29, +58) end-to-end.
        WITH geo AS (
            SELECT doc_id, 4 + doc_id % 12 AS w, 4 + (doc_id * 7) % 8 AS h
            FROM documents
        ), px AS (
            SELECT g.doc_id, g.w, g.h,
                   (g.doc_id + 7*xs.x + 13*ys.y) % 16 AS ix
            FROM geo g,
                 unnest(generate_series(0, g.w - 1)) xs(x),
                 unnest(generate_series(0, g.h - 1)) ys(y)
        ), rgb AS (
            SELECT doc_id, w, h,
                   (3*doc_id + 17*ix) % 256 AS r,
                   (3*doc_id + 17*ix + 29) % 256 AS gg,
                   (3*doc_id + 17*ix + 58) % 256 AS b
            FROM px
        )
        SELECT doc_id AS media_id,
               CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
               count(*) AS n_pixels,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum(gg) AS BIGINT) AS sum_g,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(least(min(b), min(gg), min(r)) AS INT) AS min_byte,
               CAST(greatest(max(b), max(gg), max(r)) AS INT) AS max_byte
        FROM rgb GROUP BY doc_id ORDER BY media_id
    """,
    "multimodal_jpeg_pixel_decode": """
        -- The Spark side synthesizes GENUINE baseline JPEGs (SOF0
        -- grayscale, custom-but-legal canonical Huffman tables, every
        -- 8x8 block DC-only with Q[0] = 8) and decodes them with the
        -- REAL stdlib path: marker walk, canonical Huffman build,
        -- entropy decode (category + EXTEND + EOB), dequantize, IDCT,
        -- level shift.  The construction makes block k's gray value an
        -- exact closed form — D + 128 for even block index,
        -- D - E + 128 for odd, D = 64 + doc_id % 64,
        -- E = 64 + 5 doc_id % 64, 64 pixels per block — which the
        -- oracle replicates, pinning every channel sum and byte
        -- extremum end-to-end (grayscale: R = G = B).
        WITH geo AS (
            SELECT doc_id,
                   1 + doc_id % 3 AS bw,
                   1 + (doc_id * 7) % 3 AS bh,
                   64 + doc_id % 64 AS d,
                   64 + (doc_id * 5) % 64 AS e
            FROM documents
        ), agg AS (
            SELECT doc_id, bw, bh, d, e,
                   bw * bh AS nb,
                   (bw * bh) // 2 AS n_odd
            FROM geo
        )
        SELECT doc_id AS media_id,
               CAST(8 * bw AS INT) AS width,
               CAST(8 * bh AS INT) AS height,
               CAST(64 * nb AS BIGINT) AS n_pixels,
               CAST(64 * ((nb - n_odd) * (d + 128)
                          + n_odd * (d - e + 128)) AS BIGINT) AS sum_b,
               CAST(64 * ((nb - n_odd) * (d + 128)
                          + n_odd * (d - e + 128)) AS BIGINT) AS sum_g,
               CAST(64 * ((nb - n_odd) * (d + 128)
                          + n_odd * (d - e + 128)) AS BIGINT) AS sum_r,
               CAST(CASE WHEN nb > 1 THEN d - e + 128
                         ELSE d + 128 END AS INT) AS min_byte,
               CAST(d + 128 AS INT) AS max_byte
        FROM agg ORDER BY media_id
    """,
    "multimodal_avi_frame_decode": """
        -- The Spark side synthesizes GENUINE AVI files (full RIFF tree:
        -- hdrl -> avih + strl -> strh 'vids'/strf BITMAPINFOHEADER,
        -- movi -> 00db chunks) whose frames are constant-color BI_RGB
        -- 24-bit DIBs with the real 4-byte row stride, and decodes them
        -- with the REAL stdlib path.  Frame f of doc d is
        -- (B, G, R) = (d + 11f, d + 11f + 85, d + 11f + 170) % 256
        -- over w*h pixels — the oracle replicates that closed form.
        WITH geo AS (
            SELECT doc_id,
                   8 + doc_id % 8 AS w,
                   4 + doc_id % 4 AS h,
                   2 + doc_id % 3 AS n
            FROM documents
        ), per_frame AS (
            SELECT g.doc_id, g.w, g.h, g.n,
                   (g.doc_id + 11 * fs.f) % 256 AS b,
                   (g.doc_id + 11 * fs.f + 85) % 256 AS gg,
                   (g.doc_id + 11 * fs.f + 170) % 256 AS r
            FROM geo g, unnest(generate_series(0, g.n - 1)) fs(f)
        )
        SELECT doc_id AS media_id,
               CAST(max(w) AS INT) AS width,
               CAST(max(h) AS INT) AS height,
               CAST(max(n) AS INT) AS n_frames,
               CAST(max(w) * max(h) * max(n) AS BIGINT) AS n_pixels,
               CAST(max(w) * max(h) * sum(b) AS BIGINT) AS sum_b,
               CAST(max(w) * max(h) * sum(gg) AS BIGINT) AS sum_g,
               CAST(max(w) * max(h) * sum(r) AS BIGINT) AS sum_r,
               CAST(least(min(b), min(gg), min(r)) AS INT) AS min_byte,
               CAST(greatest(max(b), max(gg), max(r)) AS INT) AS max_byte
        FROM per_frame GROUP BY doc_id ORDER BY media_id
    """,
    "multimodal_mjpg_avi_decode": """
        -- The Spark side synthesizes GENUINE Motion-JPEG AVIs (full
        -- RIFF tree, strf biCompression='MJPG', every 00dc chunk a
        -- complete closed-form baseline JPEG) and decodes them with
        -- the REAL cross-codec path: RIFF walk -> per-frame genuine
        -- JPEG decode (Huffman entropy + IDCT).  Frame f of doc d:
        -- even blocks gray D_f + 128, odd blocks D_f - E_f + 128,
        -- D_f = 64 + (d + 31f) % 64, E_f = 64 + (5d + 13f) % 64,
        -- 64 px/block, bw*bh blocks (grayscale: R = G = B).
        WITH geo AS (
            SELECT doc_id,
                   1 + doc_id % 3 AS bw,
                   1 + (doc_id * 7) % 3 AS bh,
                   2 + doc_id % 2 AS n
            FROM documents
        ), fr AS (
            SELECT g.doc_id, g.bw, g.bh, g.n,
                   g.bw * g.bh AS nb,
                   (g.bw * g.bh) // 2 AS n_odd,
                   64 + (g.doc_id + 31 * fs.f) % 64 AS d,
                   64 + (g.doc_id * 5 + 13 * fs.f) % 64 AS e
            FROM geo g, unnest(generate_series(0, g.n - 1)) fs(f)
        )
        SELECT doc_id AS media_id,
               CAST(8 * max(bw) AS INT) AS width,
               CAST(8 * max(bh) AS INT) AS height,
               CAST(max(n) AS INT) AS n_frames,
               CAST(64 * max(nb) * max(n) AS BIGINT) AS n_pixels,
               CAST(64 * sum((nb - n_odd) * (d + 128)
                             + n_odd * (d - e + 128)) AS BIGINT) AS sum_b,
               CAST(64 * sum((nb - n_odd) * (d + 128)
                             + n_odd * (d - e + 128)) AS BIGINT) AS sum_g,
               CAST(64 * sum((nb - n_odd) * (d + 128)
                             + n_odd * (d - e + 128)) AS BIGINT) AS sum_r,
               CAST(min(CASE WHEN nb > 1 THEN d - e + 128
                             ELSE d + 128 END) AS INT) AS min_byte,
               CAST(max(d + 128) AS INT) AS max_byte
        FROM fr GROUP BY doc_id ORDER BY media_id
    """,
    "multimodal_mp4_frame_decode": """
        -- The Spark side synthesizes GENUINE ISO-BMFF files (ftyp +
        -- full moov with real stsd/stts/stsc/stsz/stco sample tables +
        -- mdat) whose samples are planar I420 with constant luma
        -- (3d + 29f) % 256 and NEUTRAL chroma (both planes 128), so the
        -- full-range BT.601 transform yields exactly R = G = B = Y —
        -- the oracle replicates that closed form with no rounding.
        WITH geo AS (
            SELECT doc_id,
                   8 + 2 * (doc_id % 5) AS w,
                   4 + 2 * (doc_id % 3) AS h,
                   2 + doc_id % 3 AS n
            FROM documents
        ), per_frame AS (
            SELECT g.doc_id, g.w, g.h, g.n,
                   (3 * g.doc_id + 29 * fs.f) % 256 AS y
            FROM geo g, unnest(generate_series(0, g.n - 1)) fs(f)
        )
        SELECT doc_id AS media_id,
               CAST(max(w) AS INT) AS width,
               CAST(max(h) AS INT) AS height,
               CAST(max(n) AS INT) AS n_frames,
               CAST(max(w) * max(h) * max(n) AS BIGINT) AS n_pixels,
               CAST(max(w) * max(h) * sum(y) AS BIGINT) AS sum_b,
               CAST(max(w) * max(h) * sum(y) AS BIGINT) AS sum_g,
               CAST(max(w) * max(h) * sum(y) AS BIGINT) AS sum_r,
               CAST(min(y) AS INT) AS min_byte,
               CAST(max(y) AS INT) AS max_byte
        FROM per_frame GROUP BY doc_id ORDER BY media_id
    """,
    "multimodal_wav_sample_decode": """
        -- The Spark side synthesizes GENUINE PCM16 WAV clips — headers
        -- AND frame blocks — from doc_id and decodes the sample payloads
        -- with the REAL stdlib-wave+numpy path (no ffmpeg); the oracle
        -- replicates the construction's closed-form two's-complement
        -- sample (doc_id*13 + 7i) % 65536, pinning every amplitude
        -- sum/square/extremum of every clip end-to-end.
        WITH geo AS (
            SELECT doc_id, 64 + doc_id % 128 AS n FROM documents
        ), samp AS (
            SELECT g.doc_id, g.n,
                   CASE WHEN m >= 32768 THEN m - 65536 ELSE m END AS s
            FROM (
                SELECT g.doc_id, g.n,
                       (g.doc_id * 13 + 7 * i.i) % 65536 AS m
                FROM geo g, unnest(generate_series(0, g.n - 1)) i(i)
            ) g
        )
        SELECT doc_id AS media_id, 1 AS channels, 8000 AS sample_rate,
               count(*) AS n_samples,
               CAST(sum(s) AS BIGINT) AS sum_amp,
               CAST(sum(s * s) AS BIGINT) AS sum_sq,
               CAST(min(s) AS INT) AS min_amp,
               CAST(max(s) AS INT) AS max_amp
        FROM samp GROUP BY doc_id ORDER BY media_id
    """,
    "multimodal_video_decode": """
        -- The Spark side synthesizes GENUINE avi/mp4 container bytes from
        -- doc_id and walks them with the REAL stdlib chunk/box parsers
        -- (RIFF tree to avih; ISO-BMFF boxes to mvhd); the oracle
        -- replicates the construction arithmetic.  MP4 geometry/frames
        -- are NULL by contract (mvhd carries time, not track pixels).
        -- Container sizes fixed by construction: avi 88 B, mp4 132 B.
        SELECT fmt AS format, count(*) AS n_media,
               CAST(sum(frames) AS BIGINT) AS sum_frames,
               CAST(sum(dur_ms) AS DOUBLE) AS sum_duration_ms,
               CAST(sum(w) AS BIGINT) AS sum_width,
               CAST(sum(h) AS BIGINT) AS sum_height,
               CAST(sum(nbytes) AS BIGINT) AS sum_bytes
        FROM (
            SELECT CASE doc_id % 2 WHEN 0 THEN 'avi' ELSE 'mp4' END AS fmt,
                   CASE doc_id % 2 WHEN 0 THEN 10 + doc_id % 240 END AS frames,
                   CASE doc_id % 2
                        WHEN 0 THEN 40.0 * (10 + doc_id % 240)
                        ELSE CAST(100 + doc_id % 900 AS DOUBLE) END AS dur_ms,
                   CASE doc_id % 2 WHEN 0 THEN 32 + doc_id % 32 END AS w,
                   CASE doc_id % 2 WHEN 0 THEN 24 + doc_id % 24 END AS h,
                   CASE doc_id % 2 WHEN 0 THEN 88 ELSE 132 END AS nbytes
            FROM documents
        ) GROUP BY fmt ORDER BY format
    """,
    "multimodal_frame_sample": """
        -- one row per 64-byte frame window of the utf8 payload, i.e. the
        -- mapInPandas 1->N expansion shape, replicated relationally:
        -- frames = range(0, max(n,1)) step 64 -> ceil(max(n,1)/64) rows
        SELECT doc_id AS media_id,
               CAST(f AS INT) AS frame_no,
               CAST(least(64, greatest(octet_length(encode(text)), 0) - f * 64)
                    AS INT) AS frame_bytes
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(
                       0,
                       CAST(ceil(greatest(octet_length(encode(text)), 1)
                                 / 64.0) AS BIGINT) - 1)) AS f
            FROM documents
        )
    """,
}

# frame-level audio features: the synthesized sample at index i is the
# int16 two's-complement of (doc_id*13 + i*7) % 65536, so every frame's
# energy / zero-crossing count recomputes from pure arithmetic — the
# Spark side must produce them through a GENUINE wave-module decode
ORACLES["multimodal_wav_frame_features"] = """
    WITH params AS (
        SELECT doc_id AS media_id, 64 + doc_id % 128 AS n FROM documents
    ),
    frames AS (
        SELECT media_id, unnest(range(0, n // 32)) AS frame_idx FROM params
    ),
    samp AS (
        SELECT media_id, frame_idx,
               unnest(range(frame_idx * 32, frame_idx * 32 + 32)) AS i
        FROM frames
    ),
    vals AS (
        SELECT media_id, frame_idx, i,
               CASE WHEN m >= 32768 THEN m - 65536 ELSE m END AS v,
               CASE WHEN m2 >= 32768 THEN m2 - 65536 ELSE m2 END AS v_next
        FROM (
            SELECT media_id, frame_idx, i,
                   (media_id * 13 + i * 7) % 65536 AS m,
                   (media_id * 13 + (i + 1) * 7) % 65536 AS m2
            FROM samp
        )
    )
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           32 AS n_samples,
           CAST(sum(v) AS BIGINT) AS sum_amp,
           CAST(sum(v * v) AS BIGINT) AS sum_sq,
           CAST(sum(CASE WHEN (i % 32) < 31 AND v * v_next < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
    FROM vals
    GROUP BY media_id, frame_idx
    ORDER BY media_id, frame_idx
"""

# real BMP resize: the pixel byte at (x, y, c) is
# (doc_id + 3x + 5y + 11c) % 256, so every post-resize statistic
# recomputes from arithmetic over the sampled even-x/even-y grid
ORACLES["multimodal_bmp_resize"] = """
    WITH p AS (
        SELECT doc_id AS media_id, 4 + doc_id % 12 AS w,
               4 + (doc_id * 7) % 8 AS h
        FROM documents
    ),
    xs AS MATERIALIZED (
        SELECT media_id, w, h, unnest(range(0, w, 2)) AS x FROM p
    ),
    g AS MATERIALIZED (
        SELECT media_id, w, h, x, unnest(range(0, h, 2)) AS y FROM xs
    ),
    v AS (
        SELECT media_id, w, h,
               (media_id + 3 * x + 5 * y) % 256 AS b,
               (media_id + 3 * x + 5 * y + 11) % 256 AS gg,
               (media_id + 3 * x + 5 * y + 22) % 256 AS r
        FROM g
    )
    SELECT media_id,
           CAST(max(w) AS INT) AS in_width,
           CAST(max(h) AS INT) AS in_height,
           CAST((max(w) + 1) // 2 AS INT) AS out_width,
           CAST((max(h) + 1) // 2 AS INT) AS out_height,
           CAST(sum(b) AS BIGINT) AS sum_b,
           CAST(sum(gg) AS BIGINT) AS sum_g,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(least(min(b), min(gg), min(r)) AS INT) AS min_byte,
           CAST(greatest(max(b), max(gg), max(r)) AS INT) AS max_byte
    FROM v GROUP BY media_id ORDER BY media_id
"""


# multi-frame GIF census: the synthetic corpus is closed-form in
# doc_id (n frames of 8B GCE + 10B descriptor + 3+sub B data between a
# 13B header/LSD and the 1B trailer), so every walked count is pinned
ORACLES["multimodal_gif_frame_census"] = """
    SELECT doc_id AS media_id,
           CAST(1 + doc_id % 5 AS INT) AS n_frames,
           CAST(1 + doc_id % 5 AS INT) AS n_extensions,
           CAST((1 + doc_id % 5) * (1 + doc_id % 3) AS BIGINT)
               AS lzw_data_bytes,
           CAST((1 + doc_id % 5) * (1 + doc_id % 100) AS BIGINT)
               AS total_delay_cs,
           CAST(14 + (1 + doc_id % 5) * (22 + doc_id % 3) AS BIGINT)
               AS byte_len
    FROM documents ORDER BY media_id
"""


# content dedup census: the synthetic corpus's payload is a pure
# function of (format, w, h), so the oracle counts in parameter space
# while the Spark side hashes real bytes — agreement proves the
# byte-level fingerprint collapses exactly the constructed collisions
ORACLES["multimodal_media_dedup"] = """
    WITH keys AS (
        SELECT ['png','bmp','gif','jpeg'][CAST(doc_id % 4 AS INT) + 1]
                   AS media_type,
               16 + doc_id % 64 AS w,
               16 + (doc_id * 7) % 48 AS h
        FROM documents
    ),
    groups AS (
        SELECT media_type, w, h, count(*) AS n_copies
        FROM keys GROUP BY 1, 2, 3
    )
    SELECT media_type,
           CAST(sum(n_copies) AS BIGINT) AS n_media,
           count(*) AS n_distinct_payloads,
           CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups,
           max(n_copies) AS max_copies
    FROM groups GROUP BY 1 ORDER BY 1
"""

# silence runs over the closed-form PCM: gaps-and-islands on the
# |v| < 1000 mask replays the decode-side run-length scan exactly
ORACLES["multimodal_wav_silence"] = """
    WITH params AS (
        SELECT doc_id AS media_id, 64 + doc_id % 128 AS n FROM documents
    ), samp AS (
        SELECT media_id, n, unnest(range(0, n)) AS i FROM params
    ), vals AS (
        SELECT media_id, n, i,
               CASE WHEN m >= 32768 THEN m - 65536 ELSE m END AS v
        FROM (SELECT media_id, n, i,
                     (media_id * 13 + i * 7) % 65536 AS m
              FROM samp)
    ), marks AS (
        SELECT media_id, n, i,
               CASE WHEN abs(v) < 1000 THEN 1 ELSE 0 END AS sil
        FROM vals
    ), isl AS (
        SELECT media_id, i, sil,
               i - row_number() OVER (PARTITION BY media_id, sil
                                      ORDER BY i) AS grp
        FROM marks
    ), runs AS (
        SELECT media_id, count(*) AS run_len
        FROM isl WHERE sil = 1 GROUP BY media_id, grp
    ), run_agg AS (
        SELECT media_id, count(*) AS n_runs, max(run_len) AS longest
        FROM runs GROUP BY media_id
    ), sil_tot AS (
        SELECT media_id, CAST(sum(sil) AS INTEGER) AS n_silent
        FROM marks GROUP BY media_id
    )
    SELECT p.media_id, CAST(p.n AS INTEGER) AS n_samples,
           s.n_silent,
           CAST(coalesce(r.n_runs, 0) AS INTEGER) AS n_runs,
           CAST(coalesce(r.longest, 0) AS INTEGER) AS longest_run
    FROM params p
    JOIN sil_tot s ON s.media_id = p.media_id
    LEFT JOIN run_agg r ON r.media_id = p.media_id
    ORDER BY p.media_id
"""

# corpus channel histogram: bin counts recomputed from the closed-form
# pixel byte over the (doc, x, y) grid; empty bins are absent on both
# sides (the Spark twin filters n_pixels > 0)
ORACLES["multimodal_image_histogram"] = """
    WITH p AS (
        SELECT doc_id AS media_id, 4 + doc_id % 12 AS w,
               4 + (doc_id * 7) % 8 AS h
        FROM documents
    ), grid AS (
        SELECT media_id, x.x, y.y
        FROM p,
             LATERAL (SELECT unnest(range(0, w)) AS x) x,
             LATERAL (SELECT unnest(range(0, h)) AS y) y
    ), px AS (
        SELECT 'b' AS channel,
               ((media_id + 3 * x + 5 * y) % 256) // 16 AS bin
        FROM grid
        UNION ALL
        SELECT 'g', ((media_id + 3 * x + 5 * y + 11) % 256) // 16
        FROM grid
        UNION ALL
        SELECT 'r', ((media_id + 3 * x + 5 * y + 22) % 256) // 16
        FROM grid
    )
    SELECT channel, CAST(bin AS INTEGER) AS bin, count(*) AS n_pixels
    FROM px GROUP BY channel, bin
    HAVING count(*) > 0
    ORDER BY channel, bin
"""

# The Adam7-interlaced decode reads a corpus whose PIXEL CONTENT is
# identical to the non-interlaced RGB corpus (only the serialization
# differs), so it shares that closed-form oracle verbatim — a decoder
# that mis-walks passes changes the sums and breaks the hash.
ORACLES["multimodal_png_interlaced_decode"] = ORACLES[
    "multimodal_png_pixel_decode"
]

# The interlaced-GIF decode reads a corpus whose pixel content is
# identical to the GIF corpus (only the row serialization and the
# interlace flag differ), so it shares that oracle verbatim; row
# PLACEMENT (sum-invisible) is pinned by the golden pytest's
# position-weighted checksum — the same gate split as the PNG Adam7
# query.
ORACLES["multimodal_gif_interlaced_decode"] = ORACLES[
    "multimodal_gif_pixel_decode"
]

# The restart-marker decode reads a corpus whose pixel content is
# identical to the base JPEG corpus (DRI/RSTn change only the entropy
# framing; interval 2 preserves the even/odd block closed form), so it
# shares that oracle verbatim — marker consumption, byte realignment,
# and predictor reset all sit on the hash path.
ORACLES["multimodal_jpeg_restart_decode"] = ORACLES[
    "multimodal_jpeg_pixel_decode"
]

# 4:2:0 chroma-subsampled color JPEGs (round 16): the Spark side
# synthesizes genuine interleaved-MCU scans (luma 2x2, chroma 1x1, one
# 16x16 MCU = 4 Y + Cb + Cr blocks) whose chroma blocks all code DC
# diff 0 — every chroma sample decodes to exactly 128, the T.871
# transform collapses to R = G = B = Y, and the Y blocks carry the base
# corpus' even/odd closed form (global block parity == column parity
# under the within-MCU raster).  The 2x2 replication upsample sits on
# the hash path: any geometry slip moves a chroma sample off 128 and
# corrupts a channel sum.  mw x mh MCUs, no crop.
ORACLES["multimodal_jpeg_subsampled_decode"] = """
    WITH geo AS (
        SELECT doc_id,
               1 + doc_id % 2 AS mw,
               1 + (doc_id // 2) % 2 AS mh,
               64 + doc_id % 64 AS d,
               64 + (doc_id * 5) % 64 AS e
        FROM documents
    ), agg AS (
        SELECT doc_id, mw, mh, d, e,
               4 * mw * mh AS nb
        FROM geo
    )
    SELECT doc_id AS media_id,
           CAST(16 * mw AS INT) AS width,
           CAST(16 * mh AS INT) AS height,
           CAST(256 * mw * mh AS BIGINT) AS n_pixels,
           CAST(64 * ((nb // 2) * (d + 128)
                      + (nb // 2) * (d - e + 128)) AS BIGINT) AS sum_b,
           CAST(64 * ((nb // 2) * (d + 128)
                      + (nb // 2) * (d - e + 128)) AS BIGINT) AS sum_g,
           CAST(64 * ((nb // 2) * (d + 128)
                      + (nb // 2) * (d - e + 128)) AS BIGINT) AS sum_r,
           CAST(d - e + 128 AS INT) AS min_byte,
           CAST(d + 128 AS INT) AS max_byte
    FROM agg ORDER BY media_id
"""
