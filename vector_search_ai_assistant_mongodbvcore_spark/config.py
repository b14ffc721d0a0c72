"""Engine configuration layer (F11).

Reference: every tunable arrives as a STRING (appsettings/bicep) and is
parsed with int.TryParse-with-fallback —
/root/reference/SharedLib/Services/MongoDbService.cs:56 (k=10),
OpenAiService.cs:91-93 (conversation 100 / completion 500 / embedding 8000
token fallbacks), Search/appsettings.json:15-17 and azuredeploy.bicep:47-52
for the deployed values, plus the index kind switch (appsettings.json:24).

Same contract here: `try_parse_int` never raises (C# TryParse semantics —
garbage input silently falls back), and EngineConfig hydrates from a dict /
environment with the reference's fallback values.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields


def try_parse_int(value, fallback: int) -> int:
    """C# int.TryParse semantics: leading/trailing whitespace ok, base-10
    integers only, ANY failure (None, '', floats, junk) -> fallback."""
    if isinstance(value, bool):  # bool is an int subclass; reject explicitly
        return fallback
    if isinstance(value, int):
        return value
    try:
        return int(str(value).strip())
    except (TypeError, ValueError):
        return fallback


@dataclass
class EngineConfig:
    # MongoDbService.cs:56 / appsettings.json:23
    max_vector_search_results: int = 10
    # OpenAiService.cs:91-93 fallbacks; appsettings.json:15-17 deploys 1000/2000/8000
    max_conversation_tokens: int = 100
    max_completion_tokens: int = 500
    max_embedding_tokens: int = 8000
    # appsettings.json:24 ("hnsw" | "ivf"); the engine maps hnsw -> exact
    # top-k (documented skip, operators/ivf.py) and ivf -> IvfIndex
    vector_index_type: str = "ivf"
    # MongoDbService.cs:158 numLists
    ivf_num_lists: int = 2
    collection_names: tuple[str, ...] = ("products", "customers", "salesOrders", "completions")

    _INT_FALLBACKS = {
        "max_vector_search_results": 10,
        "max_conversation_tokens": 100,
        "max_completion_tokens": 500,
        "max_embedding_tokens": 8000,
        "ivf_num_lists": 2,
    }

    @classmethod
    def from_dict(cls, raw: dict) -> "EngineConfig":
        """Hydrate from string-typed settings (the appsettings shape)."""
        cfg = cls()
        for name, fb in cls._INT_FALLBACKS.items():
            if name in raw:
                setattr(cfg, name, try_parse_int(raw[name], fb))
        if "vector_index_type" in raw:
            cfg.vector_index_type = str(raw["vector_index_type"]).strip().lower() or cfg.vector_index_type
        if "collection_names" in raw:
            # "products, customers, salesOrders, completions" (appsettings.json:22)
            v = raw["collection_names"]
            cfg.collection_names = tuple(
                s.strip() for s in (v.split(",") if isinstance(v, str) else v) if str(s).strip()
            )
        return cfg

    @classmethod
    def from_env(cls, prefix: str = "VSAI_") -> "EngineConfig":
        raw = {
            f.name: os.environ[prefix + f.name.upper()]
            for f in fields(cls)
            if prefix + f.name.upper() in os.environ
        }
        return cls.from_dict(raw)
