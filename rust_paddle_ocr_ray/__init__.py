"""rust_paddle_ocr_ray — a Ray-Data-native main-content extraction engine.

A from-scratch re-expression of rust-paddle-ocr's two-stage
detect -> recognize architecture (/root/reference, v1.4.2) over
Common-Crawl-style Parquet web pages:

- detection  = stateless ``map_batches`` over zero-copy Arrow:
  HTML block segmentation + text-density scoring (stages/detect.py)
- recognition = stateful actor pool: charset-routed CTC-greedy decode
  (stages/recognize.py)
- merge       = combiner partial-merge + planned url dedup (key-only
  scan, broadcast winner filter, streaming finalize; stages/merge.py)
- checkpoints = per-partition lineage/metrics + kill/resume
  (state/checkpoint.py)
- plus the large-scale training-data operators: dedup family, ANN
  similarity search, text analysis, sessionization/as-of join,
  multimodal plumbing (stages/*)

Library code never calls ``ray.init`` / ``ray.shutdown`` (driver
contract, __ray_entry__.py); the CLI (``python -m rust_paddle_ocr_ray``)
and bench.py own their sessions.
"""

from .config import CLI_CONFIG, DEFAULT_CONFIG, ExtractConfig
from .pipelines.extract import ExtractPipeline

__all__ = ["ExtractConfig", "DEFAULT_CONFIG", "CLI_CONFIG", "ExtractPipeline"]
__version__ = "0.1.0"
