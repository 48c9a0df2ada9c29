"""Job configuration: INI file + CLI override harmonization.

Reference behavior (saber/config.py:29-216 + saber/config.ini:1-81): a
ConfigParser INI with sections mode/data/model/training/advanced, harmonized
against CLI args (CLI wins unless the value is None/False), post-processed
(comma lists split, types coerced), and re-saveable next to a trained model.

Rebuild: a typed dataclass covering the pipeline's knobs, the same
INI-sections layout, the same harmonization rule, and round-trip save/load.
Consumed by spark-submit jobs as plain parameters.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import asdict, dataclass, field, fields

CONFIG_FILENAME = "config.ini"  # parity: saber/constants.py CONFIG_FILENAME

_SECTIONS = {
    "mode": ["model_name", "save_model"],
    "data": ["input_path", "output_path", "checkpoint_dir",
             "pretrained_model", "pretrained_embeddings"],
    "model": ["model_kind", "max_sent_len", "max_char_len"],
    "pipeline": ["lang", "coref", "repartition", "salt_buckets",
                 "entity_types"],
}


@dataclass
class SaberSparkConfig:
    # [mode]
    model_name: str = "VITERBI-CRF"
    save_model: bool = False
    # [data]
    input_path: str = ""
    output_path: str = "./output"
    checkpoint_dir: str = ""
    pretrained_model: str = ""
    pretrained_embeddings: str = ""
    # [model]
    model_kind: str = "dict"
    max_sent_len: int = 100   # parity: saber/constants.py:62
    max_char_len: int = 25    # parity: saber/constants.py:64
    # [pipeline]
    lang: str = "en"
    coref: bool = False       # off by default, like the reference
    repartition: int = 0      # 0 = auto
    salt_buckets: int = 64
    entity_types: list[str] = field(
        default_factory=lambda: ["PRGE", "DISO", "CHED", "LIVB"])

    @classmethod
    def load(cls, filepath: str | None = None,
             cli_args: dict | None = None) -> "SaberSparkConfig":
        """INI + CLI harmonization (CLI wins unless value is None/False —
        the reference's rule at saber/config.py:67-89)."""
        cfg = cls()
        if filepath is not None:
            parser = configparser.ConfigParser()
            if not parser.read(filepath):
                raise FileNotFoundError(filepath)
            typed = {f.name: f for f in fields(cls)}
            for section in parser.sections():
                for key, raw in parser[section].items():
                    if key not in typed:
                        raise ValueError(f"unknown config key {key!r} in "
                                         f"[{section}] of {filepath}")
                    setattr(cfg, key, _coerce(raw, getattr(cfg, key)))
        for key, value in (cli_args or {}).items():
            if value is not None and value is not False and hasattr(cfg, key):
                setattr(cfg, key, value)
        return cfg

    def save(self, directory: str) -> str:
        """Write the harmonized config next to a model artifact
        (parity: saber/config.py:38-65)."""
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, CONFIG_FILENAME)
        values = asdict(self)
        with open(path, "w") as f:
            for section, keys in _SECTIONS.items():
                f.write(f"[{section}]\n")
                for key in keys:
                    v = values[key]
                    if isinstance(v, list):
                        v = ", ".join(str(x) for x in v)
                    f.write(f"{key} = {v}\n")
                f.write("\n")
        return path


def _coerce(raw: str, default):
    raw = raw.strip()
    if isinstance(default, bool):
        return raw.lower() in ("true", "1", "yes")
    if isinstance(default, int):
        return int(raw) if raw else default
    if isinstance(default, list):
        return [x.strip() for x in raw.split(",") if x.strip()]
    return raw
