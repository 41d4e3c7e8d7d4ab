"""vfr_tpu — TPU-native text-to-video moment retrieval framework.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of
``mariyashcheg/video-fragments-retrieval`` (MCN/CAL-lineage moment retrieval
on DiDeMo / Charades-STA), designed TPU-first:

- query tower: GloVe lookup -> LSTM (lax.scan / Pallas) -> projection
- moment tower: segment pooling expressed as a static pooling-matrix matmul
  (MXU-native) + temporal endpoint features + projection MLP
- triplet ranking loss with intra-/inter-video negatives, fully vectorized
  on device (the in-batch query x moment distance tensor is one MXU matmul)
- corpus-level retrieval: cached moment-embedding index, query x corpus
  similarity as sharded MXU matmuls over an ICI mesh + distributed top-k

Capability contract: /root/repo/BASELINE.json (the reference tree is empty
at v0 — see SURVEY.md §0 — so no reference file:line citations exist).
"""

__version__ = "0.1.0"

from vfr_tpu.config import (  # noqa: F401
    DataConfig,
    EvalConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
    get_preset,
    PRESETS,
)
