"""Single dataclass config for the whole framework.

Replaces the reference's scattered argparse flags (util/hyper_para.py,
interactive_gui.py:975-988, eval_interactive_davis.py:22-30) with one
typed config. Stage-dependent training defaults mirror
util/hyper_para.py:46-53.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class MemoryConfig:
    top_k: Optional[int] = 50          # reference prop_net.py:132
    mem_freq: int = 5                  # reference inference_core.py:36
    km: Optional[float] = None         # kernelized-memory sigma (off by default)
    bank_cap_frames: int = 512         # hard cap on committed memory frames
    # Host-offload policy replacing the reference's mem_profile levels
    # (inference_core.py:44-63): 0 = all on device; 1 = frames on host,
    # results on device; 2/3 = both on host with shrinking buffers.
    mem_profile: int = 0
    # Device-resident query-feature cache for multi-round sessions (the
    # reference's q_buf, inference_core.py:96-104, rebuilt TPU-side):
    # frames are PRE-ENCODED in batched windows before each pass
    # (batch-16 conv towers, core/inference.py::_precompute_queries)
    # and the propagation scan gathers the cached features by index.
    # Disabled when the video would exceed query_cache_bytes.
    cache_queries: bool = True
    query_cache_bytes: int = 3 << 30
    # Pre-encode from the FIRST pass (default): every pass, including
    # round 1, runs the scan in 'cached' mode. Set False for the legacy
    # lazy policy: round 1 encodes batch-1 inside the scan and the
    # pre-encode happens before round 2's passes.
    qcache_eager: bool = True
    # Bank sharding — the sequence-parallel path for banks beyond one
    # chip's HBM (SURVEY.md section 5.7; the reference is single-device,
    # inference_core.py:36). When True the session shards the memory
    # bank's position axis over `bank_axis` of the Mesh passed to
    # InferenceCore(mesh=...): reads run as an exact O(query)-
    # communication shard_map (parallel/sharded_memory.py) and per-slot
    # writes are collective-free masked local updates. Requires
    # mem_profile == 0 (device-resident scan path).
    bank_sharded: bool = False
    bank_axis: str = "data"
    # Object sharding — multi-chip LATENCY scaling for one session. The
    # object axis K is a pure batch axis through the per-object memory
    # read + decoder up-path + memorize; the query tower and the
    # decoder skip towers run once and stay replicated. Measured from
    # the compiled cost model (tests/test_sharding_costs.py): the
    # object-parallel FLOP fraction is ~0.72 at the production K=3
    # 480p shape (1.9x per-device FLOP reduction on 3 chips) and
    # ~0.86 at K=8 (4.1x on 8 chips) — it grows with K because the
    # shared towers amortize. Sharding over `object_axis` of the Mesh
    # passed to InferenceCore(mesh=...) splits each propagated frame's
    # dominant compute across chips; GSPMD inserts the small
    # cross-object collectives (the aggregate softmax/background
    # product and the label argmax — O(K x H x W), no bank-sized
    # traffic, independent of bank length). K must be
    # divisible by the axis size (size the object axis to a divisor of
    # K). Composes with bank_sharded on a 2D mesh carrying both axes
    # (e.g. 8 chips = 2 object x 4 position): each device then owns its
    # objects' slice of the bank, read/write collectives run over the
    # position axis only, and the object axis stays embarrassingly
    # parallel. The reference is single-device (inference_core.py:36).
    object_sharded: bool = False
    object_axis: str = "object"
    # Label-download codec for scan passes (ops/label_codec.py). Label
    # maps are the per-round deliverable and the host link is slow, so
    # how they ship matters: "packed" = dense adaptive 1/2/4-bit maps;
    # "block" = block-sparse (uniform 8x8 blocks as one value + raw
    # boundary blocks, ~7-12x smaller on segmentation content, dense
    # per-frame fallback on pathological inputs); "auto" (default) =
    # block when the class count is packable, else packed.
    label_codec: str = "auto"
    # Mixed-block buffer capacity as a fraction of the block count;
    # frames whose boundary-block count exceeds it fall back to a dense
    # fetch (label_codec doc above). 1/8 is ~5-10x the boundary share
    # of typical multi-object masks.
    label_block_cap_frac: float = 0.125

    def __post_init__(self):
        if self.label_codec not in ("auto", "packed", "block"):
            raise ValueError(
                f"label_codec must be auto/packed/block, got "
                f"{self.label_codec!r}")
        if not 0.0 < self.label_block_cap_frac <= 1.0:
            raise ValueError("label_block_cap_frac must be in (0, 1]")

    @property
    def query_buf_size(self) -> int:
        return {0: 105, 1: 105, 2: 3}.get(self.mem_profile, 1)

    @property
    def image_buf_size(self) -> int:
        return {0: 105, 1: 105, 2: 3}.get(self.mem_profile, 1)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    key_dim: int = 128
    val_dim: int = 512
    # Compute dtype for conv towers; params stay fp32. bfloat16 keeps the
    # MXU at full rate; the affinity softmax always runs fp32.
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Fusion-module training (reference util/hyper_para.py:7-59)."""

    stage: int = 0                     # 0 = BL30K, 1 = DAVIS
    batch_size: int = 12
    lr: float = 1e-4                   # reference hyper_para.py:24
    iterations: Optional[int] = None   # stage default if None
    steps: Optional[Tuple[int, ...]] = None
    gamma: float = 0.1
    seed: int = 14159265               # reference train.py:29
    save_every: int = 5000
    report_every: int = 50
    data_axis: str = "data"            # mesh axis name for DP

    def resolved_iterations(self) -> int:
        if self.iterations is not None:
            return self.iterations
        return 30000 if self.stage == 0 else 10000

    def resolved_steps(self) -> Tuple[int, ...]:
        if self.steps is not None:
            return self.steps
        return (20000,) if self.stage == 0 else (7500,)


@dataclasses.dataclass(frozen=True)
class Config:
    memory: MemoryConfig = dataclasses.field(default_factory=MemoryConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # f-BRS knobs (reference interact/fbrs_controller.py:7-53)
    fbrs_max_clicks: int = 8
    fbrs_lbfgs_maxfun: int = 20
    fbrs_zoom_target: int = 480
    fbrs_zoom_expand: float = 1.4
