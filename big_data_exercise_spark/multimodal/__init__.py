"""Multimodal (image/audio/video) column handling.

Media travel as opaque ``binary`` columns with typed metadata — the
Spark-native version of the reference's base64-JPEG-in-a-string frames
(video_producer.py:93-104). Pixel-level work stays in Arrow-batched
pandas UDFs; the codec libraries are absent from this container, so
the decode kernels are stubbed deterministically (clearly marked) and
the Spark-side plumbing — schema, partitioning, UDF signatures, batch
shapes — is real and tested.
"""
