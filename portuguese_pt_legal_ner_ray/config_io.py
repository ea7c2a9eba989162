"""YAML <-> dataclass config round-trip (reference parity: ConfigManager,
reference src/config.py:223-347 — yaml.safe_load into nested dataclasses
and the inverse). Drives pipeline assembly from a config file, mirroring
the reference's YAML-driven experiment configs."""

from __future__ import annotations

from dataclasses import asdict
from pathlib import Path

import yaml

from .config import LinkingConfig, PipelineConfig


def load_config(path: str | Path) -> PipelineConfig:
    raw = yaml.safe_load(Path(path).read_text()) or {}
    link_raw = raw.pop("linking", {}) or {}
    ner_conc = raw.get("ner_concurrency")
    if isinstance(ner_conc, list):
        raw["ner_concurrency"] = tuple(ner_conc)
    return PipelineConfig(linking=LinkingConfig(**link_raw), **raw)


def save_config(cfg: PipelineConfig, path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    d = asdict(cfg)
    if isinstance(d.get("ner_concurrency"), tuple):
        d["ner_concurrency"] = list(d["ner_concurrency"])
    path.write_text(yaml.safe_dump(d, sort_keys=True))
    return path
