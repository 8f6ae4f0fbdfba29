"""Scalar functions: the converter expression language and hashing/text
kernels (the convert2-DSL function surface, SURVEY.md §2.7)."""

from geomesa_nifi_ray.convert import FieldSpec, RecordConverter, java_to_strptime, parse_expr
from geomesa_nifi_ray.hashing import add_hash_and_bucket, bucket_ids, content_hash_rows
from geomesa_nifi_ray.avro_io import read_avro, write_avro
from geomesa_nifi_ray.multimodal import (
    decode_bmp,
    decode_ppm,
    decode_wav_pcm16,
    encode_bmp,
    encode_wav_pcm16,
)
from geomesa_nifi_ray.text import (
    bpe_token_count,
    extract_text,
    extract_text_batch,
    rolling_fingerprint,
    rolling_window_hashes,
    whitespace_token_count,
)

__all__ = [
    "FieldSpec",
    "RecordConverter",
    "parse_expr",
    "java_to_strptime",
    "content_hash_rows",
    "bucket_ids",
    "add_hash_and_bucket",
    "extract_text",
    "extract_text_batch",
    "whitespace_token_count",
    "bpe_token_count",
    "rolling_fingerprint",
    "rolling_window_hashes",
    "read_avro",
    "write_avro",
    "decode_bmp",
    "decode_ppm",
    "decode_wav_pcm16",
    "encode_bmp",
    "encode_wav_pcm16",
]
