from bge_m3_onnx_spark.sources.transcripts import (
    TRANSCRIPTS_SCHEMA,
    doc_id_col,
    read_transcripts,
    synth_transcripts,
    transcripts_from_documents,
)

__all__ = [
    "TRANSCRIPTS_SCHEMA",
    "doc_id_col",
    "read_transcripts",
    "synth_transcripts",
    "transcripts_from_documents",
]
