"""TOML configuration — parity with the reference's ``config/config.go``.

The reference's config has three sections (``/root/reference/config/
config.go:7-30``): ``[cohere]`` (api_key, model), ``[db]`` (persist_dir +
embedded-Postgres/FerretDB connection knobs), ``[hnsw]`` (m,
ef_construction). Here:

* ``[cohere]`` → the embedding provider (model → dim via the same map,
  ``config/config.go:59``); an api_key selects the HTTP provider, none
  selects the deterministic offline embedder.
* ``[db]`` → just ``persist_dir`` (the warehouse root). The server knobs
  (postgres_*, ferretdb_*) have no meaning without embedded servers; they
  are accepted and ignored so a reference config file parses unchanged.
* ``[hnsw]`` → mapped onto the IVF index knobs (``index_cells``,
  ``nprobe``) — the graph parameters have no direct analogue, but the
  section name is honored for drop-in config compatibility; an explicit
  ``[index]`` section takes precedence.

Defaults mirror the reference's ``defaultCfg`` (``config/config.go:32-49``)
where meaningful: model ``multilingual-22-12``, dir ``/tmp/kaer``.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass

from kaer_spark.embeddings import HTTPEmbedder

#: reference model→dimension map, config/config.go:59 — single source of
#: truth lives on the provider (embeddings.HTTPEmbedder.MODEL_DIMS)
COHERE_MODEL_DIMS = HTTPEmbedder.MODEL_DIMS


@dataclass
class KaerConfig:
    persist_dir: str = "/tmp/kaer"  # config/config.go:38
    model: str = "multilingual-22-12"  # config/config.go:35
    api_key: str = ""
    dim: int | None = None  # derived from model unless set explicitly
    index_cells: int = 16
    nprobe: int = 4

    def __post_init__(self) -> None:
        if self.dim is None:
            self.dim = COHERE_MODEL_DIMS.get(self.model, 1024)

    @property
    def uses_http_provider(self) -> bool:
        return bool(self.api_key)


def parse_config(path: str) -> KaerConfig:
    """Parse a reference-style TOML file; unknown keys are ignored (the
    reference's decoder is similarly lenient)."""
    with open(path, "rb") as f:
        raw = tomllib.load(f)
    cohere = raw.get("cohere", {})
    db = raw.get("db", {})
    index = raw.get("index", raw.get("hnsw", {}))
    return KaerConfig(
        persist_dir=db.get("persist_dir", "/tmp/kaer"),
        model=cohere.get("model", "multilingual-22-12"),
        api_key=cohere.get("api_key", ""),
        index_cells=int(index.get("cells", index.get("m", 16))),
        nprobe=int(index.get("nprobe", 4)),
    )


def context_from_config(spark, cfg: KaerConfig | str):
    """Build a KaerContext the way the reference builds ``Kaer`` from its
    parsed config (``db/kaer.go:84-117``, minus the server ladder)."""
    from kaer_spark.context import KaerContext
    from kaer_spark.embeddings import HashingEmbedder, HTTPEmbedder

    if isinstance(cfg, str):
        cfg = parse_config(cfg)
    if cfg.uses_http_provider:
        provider = HTTPEmbedder(model=cfg.model, api_key=cfg.api_key)
        provider.dim = cfg.dim
    else:
        provider = HashingEmbedder(dim=cfg.dim)
    return KaerContext(spark, cfg.persist_dir, default_provider=provider)
