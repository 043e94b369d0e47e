"""Dataset registry: name -> spec database.

The reference keeps its dataset database as module-level dicts in
``mmgpt/utils/constants.py:25-353`` (``CONVERSATION_DATA`` /
``INTERLEAVE_DATA`` / ``PAIR_WEBDATA`` / ``INTERLEAVE_WEBDATA``) — which, as
shipped, is a SyntaxError (the CONVERSATION_DATA dict literal was truncated
when internal entries were scrubbed). This module is the well-formed
replacement: a typed registry with a ``register``/``get_spec`` API, the four
reference families, and path roots configurable through the
``MERLIN_DATA_ROOT`` environment variable instead of hard-coded cluster
paths.

Spec schemas (reference parity):
  conversation:  {images, annotations, frequency[, merge_round]}
  interleave(json): {images, annotations, frequency, use_eos_for_each_turn}
  pair/pair_token/interpair (webdata): {path (glob or list), size, merge_round}
  interleave_webdata: {path, size}
"""

from __future__ import annotations

import dataclasses
import glob as _glob
import os
from typing import Dict, List, Optional, Sequence, Union


def data_root() -> str:
    return os.environ.get("MERLIN_DATA_ROOT", "/data/merlin")


@dataclasses.dataclass
class ConversationSpec:
    annotations: str
    images: str = ""
    frequency: float = 1.0
    merge_round: int = 0  # 0 = no round merging


@dataclasses.dataclass
class InterleaveJsonSpec:
    annotations: str
    images: str = ""
    frequency: float = 1.0
    use_eos_for_each_turn: bool = True


@dataclasses.dataclass
class WebdataSpec:
    path: Union[str, List[str]]  # shard glob or explicit shard list
    size: int
    merge_round: int = 1

    def shard_list(self) -> List[str]:
        """Expand the glob / return the explicit list of shard paths.
        s3:// expands through the credentialed storage adapter
        (boto3-or-fsspec, reference base_dataset.py:33-35 semantics);
        other remote schemes through fsspec."""
        if isinstance(self.path, str):
            if self.path.startswith("s3://") \
                    and any(c in self.path for c in "*?["):
                from merlin_tpu.data.storage import list_keys

                return list_keys(self.path)
            if "://" in self.path and any(c in self.path for c in "*?["):
                import fsspec

                fs, _ = fsspec.core.url_to_fs(self.path)
                proto = self.path.split("://", 1)[0]
                return sorted(f"{proto}://{p}" for p in fs.glob(self.path))
            if any(c in self.path for c in "*?["):
                return sorted(_glob.glob(self.path))
            return [self.path]
        return list(self.path)


# family name -> {dataset name -> spec}
_REGISTRY: Dict[str, Dict[str, object]] = {
    "conversation": {},
    "interleave_json": {},
    "pair": {},
    "pair_token": {},
    "interpair": {},
    "interleave": {},
}

FAMILIES = tuple(_REGISTRY)


def register(family: str, name: str, spec) -> None:
    if family not in _REGISTRY:
        raise KeyError(f"unknown dataset family {family!r}; one of {FAMILIES}")
    _REGISTRY[family][name] = spec


def get_spec(family: str, name: str):
    try:
        return _REGISTRY[family][name]
    except KeyError:
        known = ", ".join(sorted(_REGISTRY.get(family, {})))
        raise KeyError(
            f"dataset {name!r} not registered in family {family!r} (known: {known})"
        ) from None


def names(family: str) -> List[str]:
    return sorted(_REGISTRY[family])


def parse_dataset_flag(flag: str) -> List[str]:
    """``"a+b+c"`` -> ``["a","b","c"]`` (reference data/builder.py:27)."""
    return [n for n in flag.split("+") if n]


def _seed_defaults() -> None:
    """Register the dataset names the reference launch recipes use.

    Paths are $MERLIN_DATA_ROOT-relative; users point the env var at their
    own mirror. Sizes/merge_rounds match the reference registry where the
    reference recorded them (constants.py:150-353).
    """
    root = data_root()

    # --- conversation (SFT) ---------------------------------------------
    for name, ann in [
        ("blip_laion_cc_sbu_558k", "annotations/blip_laion_cc_sbu_558k.json"),
        ("llava665k", "LLaVA1.5/llava_v1_5_mix665k.json"),
        ("llava665k_refine", "LLaVA1.5/llava_v1_5_665k_refine.json"),
        ("track_sft", "annotations/mix_sft_track_30k.json"),
        ("track_sft_v1", "annotations/merlin_sft_70k-valid.json"),
        ("track_sft_v2", "annotations/merlin_sft_70k_v2-valid.json"),
        ("track_sft_v3", "annotations/merlin_sft_90k_v3.json"),
        ("track_sft_pretrain_44k", "annotations/mix_sample_pretrain_44k.json"),
        ("track_sft_46k_v3", "annotations/mix_sample_track_sft_46k_v3.json"),
    ]:
        register("conversation", name, ConversationSpec(
            annotations=os.path.join(root, ann), images=os.path.join(root, "images")))

    # --- interleave (json) ----------------------------------------------
    register("interleave_json", "cococaption", InterleaveJsonSpec(
        annotations=os.path.join(root, "annotations/cococap_interleave_38k.json"),
        images=os.path.join(root, "COCO")))

    # --- pair webdata (pretrain) ----------------------------------------
    pair_sets = [
        ("laion2b_10m", "laion2b-en/*.tar", 10_000_000, 12),
        ("laion2b_10m_6merge", "laion2b-en/*.tar", 10_000_000, 6),
        ("laion2b_20m_6merge", "laion2b-en/*.tar", 20_000_000, 6),
        ("laion2b_5m", "laion2b-en/*.tar", 5_000_000, 12),
        ("taisu_100m", "taisu-tarfiles/*/*.tar", 100_000_000, 12),
        ("taisu_20m_6merge", "taisu-tarfiles/*/*.tar", 20_000_000, 6),
        ("laion400m_100m", "laion400m/*.tar", 100_000_000, 12),
        ("laion400m_10m", "laion400m/*.tar", 10_000_000, 12),
        ("laioncn_10m", "laion-cn/*.tar", 10_000_000, 12),
        ("synthdog_1m", "synthdog/*.tar", 1_000_000, 4),
        ("grit_10m", "grit/*.tar", 10_000_000, 6),
    ]
    for name, rel, size, mr in pair_sets:
        register("pair", name, WebdataSpec(
            path=os.path.join(root, rel), size=size, merge_round=mr))

    # --- pre-tokenized pair webdata --------------------------------------
    register("pair_token", "qa_mix_22set", WebdataSpec(
        path=os.path.join(root, "qa-token-tarfiles/*.tar"),
        size=10_000_000, merge_round=6))

    # --- interpair (video/tracking) --------------------------------------
    for name, rel, size, mr in [
        ("track_1m_2merge", "track-tarfiles/*.tar", 1_000_000, 2),
        ("track_1m_v1_2merge", "track-tarfiles-v1/*.tar", 1_000_000, 2),
        ("track_1m_v2_2merge", "track-tarfiles-v2/*.tar", 1_000_000, 2),
        ("det_5m_v1_en_4merge", "det-tarfiles-v1-en/*.tar", 5_000_000, 4),
    ]:
        register("interpair", name, WebdataSpec(
            path=os.path.join(root, rel), size=size, merge_round=mr))

    # --- interleave webdata (MMC4/OBELICS style) --------------------------
    register("interleave", "oblisc_1m", WebdataSpec(
        path=os.path.join(root, "oblisc-tarfiles/*.tar"), size=1_000_000,
        merge_round=1))


_seed_defaults()
