package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps
import graft.sources.Tables

/** Multimodal-column queries (builder brief): binary payloads + typed
  * metadata through the relational engine. Payloads are synthesized
  * deterministically from `documents.text` (the container has no media
  * files); the byte-level plumbing — binary columns, lengths, hashes,
  * slicing — is real and oracle-checked, and the codec stage is a REAL
  * binary parse of the GRFT container format
  * ([[graft.operators.MultimodalOps.GrftCodec]]): fixed-offset
  * big-endian header fields + payload statistics, oracled in DuckDB by
  * independently re-deriving every field from the same corpus.
  */
object MultimodalQueries extends QueryPack {

  override def queries: Seq[QueryDef] = Seq(

    // MM1 — binary payload + metadata struct: cast text to bytes, carry
    // (mime, size, checksum) metadata; fully oracle-checked byte plumbing.
    QueryDef(
      "q_mm1_binary_meta",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("meta", struct(
          lit("text/plain").as("mime"),
          length(col("payload")).as("bytes"),
          md5(col("payload")).as("checksum")))
        .select(
          col("doc_id"),
          col("meta.mime").as("mime"),
          col("meta.bytes").as("n_bytes"),
          col("meta.checksum").as("checksum"),
          base64(expr("substring(payload, 1, 12)")).as("head_b64"))
        .orderBy("doc_id"),
      // DuckDB's md5/substring don't take BLOBs; the corpus is ASCII, so
      // the text-level mirror hashes/slices identical bytes.
      Some("""SELECT doc_id,
             |       'text/plain' AS mime,
             |       octet_length(encode(text)) AS n_bytes,
             |       md5(text) AS checksum,
             |       to_base64(encode(substring(text, 1, 12))) AS head_b64
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // MM2 — encode + batched decode: each doc's text becomes a GRFT
    // container (14-byte big-endian header + payload; width/height
    // derived from doc_id at encode time), then GrftCodec parses the
    // header back at its fixed offsets, validates magic/version/length,
    // and computes payload statistics. The oracle re-derives every
    // field independently: header fields from the encode rule, mean
    // byte exactly (integer sums), Shannon entropy via the identical
    // ascending-byte-value ln-fold (QueryDef parity rules; round 6).
    QueryDef(
      "q_mm2_decode_features",
      (s, dir) => MultimodalOps.decodeStage(
        Tables.documents(s, dir)
          .withColumn("payload", MultimodalOps.grftEncode(
            col("doc_id") % 1280 + 64, col("doc_id") % 720 + 64,
            col("text").cast("binary")))
          .select(col("doc_id"), col("payload")),
        "payload")
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("payload_bytes"),
          round(col("mean_byte"), 6).as("mean_byte"),
          round(col("byte_entropy"), 6).as("byte_entropy"))
        .orderBy("doc_id"),
      Some("""WITH hist AS (
             |  SELECT doc_id, b, count(*) AS c
             |  FROM (SELECT doc_id, ord(ch) AS b
             |        FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
             |              FROM documents) u) t
             |  GROUP BY doc_id, b
             |), pre AS (
             |  SELECT doc_id,
             |         sum(b * c) AS sb, sum(c) AS n,
             |         list(struct_pack(b := b, c := c) ORDER BY b) AS hl
             |  FROM hist GROUP BY doc_id
             |), stats AS (
             |  SELECT doc_id,
             |         CAST(sb AS DOUBLE) / n AS mean_byte,
             |         list_aggregate(
             |           list_transform(hl,
             |             x -> -((CAST(x.c AS DOUBLE) / n)
             |                    * ln(CAST(x.c AS DOUBLE) / n) / ln(2))),
             |           'sum') AS byte_entropy
             |  FROM pre
             |)
             |SELECT d.doc_id,
             |       CAST(d.doc_id % 1280 + 64 AS INT) AS width,
             |       CAST(d.doc_id % 720 + 64 AS INT) AS height,
             |       3 AS channels,
             |       octet_length(encode(d.text)) AS payload_bytes,
             |       round(coalesce(s.mean_byte, 0.0), 6) AS mean_byte,
             |       round(coalesce(s.byte_entropy, 0.0), 6) AS byte_entropy
             |FROM documents d LEFT JOIN stats s ON d.doc_id = s.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // MM4 — RESIZE (the remaining multimodal op of the builder brief:
    // decode / feature-extract / resize / frame-sample): nearest-
    // neighbor downsample of the container's byte grid to 16×16. The
    // pixel decode itself is the brief's sanctioned deterministic fake
    // (no image libs in this container — the "pixel" at (x, y) is the
    // payload byte at the grid index, wrapped modulo payload length);
    // everything Spark-side is real plumbing: the source geometry comes
    // from the same doc_id encode rule as q_mm2's GRFT header, the
    // index arithmetic is pure int ops inside codegen, and the 256
    // sampled bytes reassemble per row with no shuffle. Fully oracled —
    // DuckDB re-derives every sampled byte with identical arithmetic.
    QueryDef(
      "q_mm4_resize",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("src_w", (col("doc_id") % 1280 + 64).cast("int"))
        .withColumn("src_h", (col("doc_id") % 720 + 64).cast("int"))
        .withColumn("resized", expr(
          """array_join(transform(sequence(0, 255), i ->
            |  substring(text,
            |    CAST((((i div 16) * src_h div 16) * src_w
            |          + ((i % 16) * src_w div 16))
            |         % greatest(length(text), 1) AS INT) + 1,
            |    1)), '')""".stripMargin))
        .select(col("doc_id"), col("src_w"), col("src_h"),
          lit(16).as("out_w"), lit(16).as("out_h"),
          md5(col("resized").cast("binary")).as("resized_md5"),
          substring(col("resized"), 1, 16).as("head"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, src_w, src_h, 16 AS out_w, 16 AS out_h,
             |       md5(resized) AS resized_md5,
             |       substring(resized, 1, 16) AS head
             |FROM (
             |  SELECT doc_id, src_w, src_h,
             |         list_aggregate(list_transform(range(0, 256),
             |           i -> substring(text,
             |                  CAST((((i // 16) * src_h // 16) * src_w
             |                        + ((i % 16) * src_w // 16))
             |                       % greatest(length(text), 1) AS INT) + 1,
             |                  1)),
             |           'string_agg', '') AS resized, text
             |  FROM (SELECT doc_id, text,
             |               CAST(doc_id % 1280 + 64 AS INT) AS src_w,
             |               CAST(doc_id % 720 + 64 AS INT) AS src_h
             |        FROM documents) g
             |) t
             |ORDER BY doc_id""".stripMargin)),

    // MM3 — frame sampling over a synthetic "video": 64-byte frames,
    // every 4th kept; per-frame checksum. Pure byte slicing — oracled.
    QueryDef(
      "q_mm3_frame_sample",
      (s, dir) => MultimodalOps.sampleFrames(
        Tables.documents(s, dir)
          .withColumn("payload", col("text").cast("binary")),
        "payload", frameSize = 64, stride = 4)
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx"),
      Some("""SELECT doc_id, frame_idx, md5(frame) AS frame_md5
             |FROM (
             |  SELECT doc_id, frame_idx,
             |         substring(text, CAST(frame_idx * 64 + 1 AS INT), 64) AS frame
             |  FROM (SELECT doc_id, text,
             |               unnest(range(0, greatest(octet_length(encode(text)) // 64, 0)))
             |                 AS frame_idx
             |        FROM documents) t
             |  WHERE frame_idx % 4 = 0
             |) f
             |ORDER BY doc_id, frame_idx""".stripMargin))
  )
}
