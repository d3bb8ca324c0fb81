"""ocr_model_ray — Ray-Data-native document/web-page extraction engine.

A from-scratch reimplementation of the extraction semantics of the
reference repo (Sagexd08/Ocr-Model, read-only at /root/reference) as
streaming ray.data.Dataset pipelines over zero-copy Arrow batches.
See SURVEY.md for the blueprint and spec.py for the frozen
determinism spec.
"""
__version__ = "0.1.0"
