"""R7: configuration management — TOML config with CLI-default precedence.

Reference: /root/reference/src/config.rs (Config/EmbeddingConfig/
BuildConfig, load/save/create_example_if_missing, config.rs:24-226) and
the CLI-default-vs-config merge in /root/reference/src/cli/build.rs:160-191.

Semantics preserved:
- Location ``~/.config/leann/config.toml`` (config.rs:130-135); override
  via the ``path`` argument for tests / deployments.
- ``load()`` returns defaults when the file is missing OR unparseable
  (config.rs:137-158 — a bad config warns and falls back, never raises).
- Defaults: provider "ollama", model "nomic-embed-text", chunk_size 256,
  chunk_overlap 128, max_file_size_kb 1024 (config.rs:73-79,113-126).
- Precedence (build.rs:160-191): a CLI value that still equals the CLI's
  *default* yields to the config file; an explicitly changed CLI value
  wins. ``merge_cli`` reproduces that rule generically.

Pure Python (stdlib ``tomllib``); no Spark involvement — this is the
driver-side planning layer.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import asdict, dataclass, field
from typing import Any

DEFAULT_PROVIDER = "ollama"  # config.rs:73-75
DEFAULT_MODEL = "nomic-embed-text"  # config.rs:77-79
DEFAULT_CHUNK_SIZE = 256  # config.rs:113-115
DEFAULT_CHUNK_OVERLAP = 128  # config.rs:117-122
DEFAULT_MAX_FILE_SIZE_KB = 1024  # config.rs:124-126

# CLI defaults that trigger the yield-to-config rule (build.rs:160-172)
CLI_DEFAULT_EMBEDDING_MODE = "openai"
CLI_DEFAULT_EMBEDDING_MODEL = "text-embedding-3-small"


@dataclass
class EmbeddingConfig:
    """config.rs:34-58 field-for-field."""

    provider: str = DEFAULT_PROVIDER
    model: str = DEFAULT_MODEL
    host: str | None = None
    base_url: str | None = None
    api_key: str | None = None
    prompt_template: str | None = None
    batch_size: int | None = None


@dataclass
class BuildConfig:
    """config.rs:82-99 field-for-field."""

    chunk_size: int = DEFAULT_CHUNK_SIZE
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP
    max_file_size_kb: int = DEFAULT_MAX_FILE_SIZE_KB
    file_types: list[str] | None = None
    exclude_types: list[str] | None = None


@dataclass
class Config:
    embedding: EmbeddingConfig = field(default_factory=EmbeddingConfig)
    build: BuildConfig = field(default_factory=BuildConfig)

    @staticmethod
    def config_path() -> str:
        """config.rs:130-135: ``<config-dir>/leann/config.toml``."""
        base = os.environ.get(
            "XDG_CONFIG_HOME", os.path.join(os.path.expanduser("~"), ".config")
        )
        return os.path.join(base, "leann", "config.toml")

    @classmethod
    def load(cls, path: str | None = None) -> "Config":
        """Missing or unparseable file → defaults (config.rs:137-158)."""
        path = path or cls.config_path()
        if not os.path.isfile(path):
            return cls()
        try:
            with open(path, "rb") as f:
                raw = tomllib.load(f)
        except (OSError, tomllib.TOMLDecodeError):
            return cls()
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "Config":
        emb_fields = {f for f in EmbeddingConfig.__dataclass_fields__}
        bld_fields = {f for f in BuildConfig.__dataclass_fields__}
        emb = {
            k: v for k, v in (raw.get("embedding") or {}).items() if k in emb_fields
        }
        bld = {k: v for k, v in (raw.get("build") or {}).items() if k in bld_fields}
        return cls(embedding=EmbeddingConfig(**emb), build=BuildConfig(**bld))

    def to_toml(self) -> str:
        """Minimal TOML writer (only str/int/list[str] values occur)."""

        def fmt(v: Any) -> str:
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, int):
                return str(v)
            if isinstance(v, list):
                return "[" + ", ".join(fmt(x) for x in v) + "]"
            return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'

        lines: list[str] = []
        for section, values in asdict(self).items():
            lines.append(f"[{section}]")
            for k, v in values.items():
                if v is not None:
                    lines.append(f"{k} = {fmt(v)}")
            lines.append("")
        return "\n".join(lines)

    def save(self, path: str | None = None) -> None:
        """config.rs:161-171."""
        path = path or self.config_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_toml())


def create_example_if_missing(path: str | None = None) -> bool:
    """config.rs:174-226: write a commented example config once."""
    path = path or Config.config_path()
    if os.path.exists(path):
        return False
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(EXAMPLE_CONFIG)
    return True


EXAMPLE_CONFIG = """\
# LEANN-Spark configuration
# Location: ~/.config/leann/config.toml

[embedding]
# Provider: ollama, lmstudio, openai, gemini, hash (deterministic test provider)
provider = "ollama"
model = "nomic-embed-text"
# host = "http://localhost:11434"
# base_url = "http://localhost:1234/v1"
# api_key = "sk-..."
# batch_size = 32

[build]
chunk_size = 256
chunk_overlap = 128
max_file_size_kb = 1024
# file_types = [".md", ".py", ".js", ".ts", ".rs", ".go"]
# exclude_types = [".min.js", ".lock"]
"""


def merge_cli(cli_value: Any, cli_default: Any, config_value: Any) -> Any:
    """build.rs:160-172's precedence rule: a CLI value still at its
    default yields to the config file; an explicit CLI value wins."""
    return config_value if cli_value == cli_default else cli_value


def resolve_build_settings(
    config: Config,
    *,
    embedding_mode: str = CLI_DEFAULT_EMBEDDING_MODE,
    embedding_model: str = CLI_DEFAULT_EMBEDDING_MODEL,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    max_file_size_kb: int = DEFAULT_MAX_FILE_SIZE_KB,
) -> dict[str, Any]:
    """The full build.rs:160-191 merge for the settings the engine uses."""
    return {
        "embedding_mode": merge_cli(
            embedding_mode, CLI_DEFAULT_EMBEDDING_MODE, config.embedding.provider
        ),
        "embedding_model": merge_cli(
            embedding_model, CLI_DEFAULT_EMBEDDING_MODEL, config.embedding.model
        ),
        "chunk_size": merge_cli(chunk_size, DEFAULT_CHUNK_SIZE, config.build.chunk_size),
        "chunk_overlap": merge_cli(
            chunk_overlap, DEFAULT_CHUNK_OVERLAP, config.build.chunk_overlap
        ),
        "max_file_size_kb": merge_cli(
            max_file_size_kb, DEFAULT_MAX_FILE_SIZE_KB, config.build.max_file_size_kb
        ),
    }
