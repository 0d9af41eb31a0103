from mysql_data_anonymizer_spark.multimodal.media import (
    MEDIA_SCHEMA,
    decode_and_featurize,
    fake_decode_batch,
    frame_sample,
)

__all__ = ["MEDIA_SCHEMA", "decode_and_featurize", "fake_decode_batch", "frame_sample"]
