"""rust_paddle_ocr_ray — a Ray-Data-native main-content extraction engine.

A from-scratch re-expression of rust-paddle-ocr's two-stage
detect -> recognize architecture (/root/reference, v1.4.2) over
Common-Crawl-style Parquet web pages:

- detection  = stateless ``map_batches`` over zero-copy Arrow:
  HTML block segmentation + text-density scoring (stages/detect.py)
- recognition = stateful actor pool: charset-routed CTC-greedy decode
  (stages/recognize.py)
- merge       = ``groupby(url).map_groups`` reading-order assembly +
  exact URL dedup (stages/merge.py)
- plus the large-scale training-data operators: dedup family, ANN
  similarity search, text analysis, multimodal plumbing (stages/*)

Library code never calls ``ray.init`` / ``ray.shutdown`` (driver
contract, __ray_entry__.py).
"""

from .config import CLI_CONFIG, DEFAULT_CONFIG, ExtractConfig

__all__ = ["ExtractConfig", "DEFAULT_CONFIG", "CLI_CONFIG"]
__version__ = "0.1.0"
