package graft.pipeline

/**
 * Data model of the KG-construction pipeline (BASELINE.json `input_hint`):
 * an interleaved text+media document is a `doc_id` plus an ordered array of
 * spans `(kind, text, media_ref, offset)`. Media spans carry no text and
 * must survive the pipeline byte-identical (the per-row span-sequence
 * invariant asserted in `sbt -batch test`).
 */
final case class Span(
    kind: String,              // "text" | "media"
    text: Option[String],      // NULL for media spans
    media_ref: Option[String], // NULL for text spans
    offset: Int)               // running character offset; array order = span order

final case class Doc(doc_id: String, spans: Seq[Span])

/** One detected relation mention inside a text span. */
final case class Mention(
    doc_id: String,
    span_idx: Int,
    subj_alias: String,
    rel: String,
    obj_alias: String)
