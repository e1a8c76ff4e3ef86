"""Config-driven source catalog (SURVEY.md §2A op 1, §2B D7–D9).

Mirrors the reference's configuration contract — a named-source registry
with URLs, limits, timeouts, retry policy and output spec
(/root/reference/config/config.json:31-56, scripts/setup_secrets.py:44-130)
— as typed dataclasses. The reference loads this from Secrets Manager
with a hardcoded fallback (lambda/lambda_function.py:151-185); here any
dict/JSON file works and `default_config()` is the fallback.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RetryConfig:
    max_retries: int = 3
    retry_delay: float = 5.0
    backoff_multiplier: float = 2.0


@dataclass(frozen=True)
class SourceConfig:
    name: str
    url: str
    limit_param: str = "limit"  # query param the source truncates on (op 6)
    default_limit: int = 10
    max_records: int = 100
    timeout: float = 30.0
    retry: RetryConfig = field(default_factory=RetryConfig)
    # D9: secondary endpoints per source (setup_secrets.py:49-54,68-72);
    # each becomes an extra catalog table named "{source}_{endpoint}".
    endpoints: tuple[tuple[str, str], ...] = ()

    def endpoint_url(self, endpoint: str) -> str:
        for name, path in self.endpoints:
            if name == endpoint:
                return self.url.rstrip("/") + path
        raise KeyError(f"{self.name} has no endpoint {endpoint!r}")


@dataclass(frozen=True)
class OutputConfig:
    partition_by: tuple[str, ...] = ("source", "extracted_date")
    compression: str | None = "snappy"
    fmt: str = "parquet"


@dataclass(frozen=True)
class ProcessingConfig:
    batch_size: int = 100
    error_handling: str = "continue"  # op 3: continue-on-error
    remove_duplicates: bool = True  # D2
    validate_schema: bool = True  # D3
    check_null_values: bool = True  # D4


@dataclass(frozen=True)
class PipelineConfig:
    sources: dict[str, SourceConfig]
    output: OutputConfig = field(default_factory=OutputConfig)
    processing: ProcessingConfig = field(default_factory=ProcessingConfig)


def default_config() -> PipelineConfig:
    """In-code fallback registry (reference parity: the 3-source fallback
    at lambda/lambda_function.py:167-185; endpoints per .env.example)."""
    return PipelineConfig(
        sources={
            "marketing": SourceConfig(
                name="marketing", url="https://fakestoreapi.com/products",
                limit_param="limit", default_limit=10, max_records=50,
                endpoints=(("categories", "/categories"),),
            ),
            "sales": SourceConfig(
                name="sales", url="https://jsonplaceholder.typicode.com/posts",
                limit_param="_limit", default_limit=10, max_records=100,
                endpoints=(("comments", "/comments"), ("users", "/users")),
            ),
            "crm": SourceConfig(
                name="crm", url="https://randomuser.me/api/",
                limit_param="results", default_limit=10, max_records=50,
            ),
        }
    )


def config_from_secret_dict(raw: dict) -> PipelineConfig:
    """Parse the reference's remote-secret schema into a PipelineConfig.

    Field-for-field parity with the secret payload the reference stores
    (scripts/setup_secrets.py:44-130) and loads at startup
    (lambda/lambda_function.py:151-165): per-source url/timeout/
    max_records/endpoints, retry under processing_config.retry_config,
    quality flags under processing_config.data_quality_checks, and
    output_config. Templated endpoints ("/products/{id}") are runtime
    paths, not catalog tables, and are skipped.
    """
    retry_raw = raw.get("processing_config", {}).get("retry_config", {})
    retry = RetryConfig(
        max_retries=int(retry_raw.get("max_retries", 3)),
        retry_delay=float(retry_raw.get("retry_delay", 5)),
        backoff_multiplier=float(retry_raw.get("backoff_multiplier", 2)),
    )
    sources = {}
    for name, sc in raw.get("data_sources", {}).items():
        endpoints = tuple(
            (ep_name, path)
            for ep_name, path in sorted(sc.get("endpoints", {}).items())
            if "{" not in path
        )
        sources[name] = SourceConfig(
            name=name,
            url=sc["url"],
            limit_param=sc.get("limit_param", "limit"),
            default_limit=int(sc.get("default_limit", 10)),
            max_records=int(sc.get("max_records", 100)),
            timeout=float(sc.get("timeout", 30)),
            retry=retry,
            endpoints=endpoints,
        )
    proc = raw.get("processing_config", {})
    quality = proc.get("data_quality_checks", {})
    out = raw.get("output_config", {})
    handling = proc.get("error_handling", "continue")
    return PipelineConfig(
        sources=sources,
        output=OutputConfig(
            partition_by=tuple(out.get("partition_by", ("source", "extracted_date"))),
            compression=out.get("compression", "snappy"),
            fmt=out.get("format", "parquet"),
        ),
        processing=ProcessingConfig(
            batch_size=int(proc.get("batch_size", 100)),
            error_handling="continue" if handling == "continue_on_error" else handling,
            remove_duplicates=bool(quality.get("remove_duplicates", True)),
            validate_schema=bool(quality.get("validate_schema", True)),
            check_null_values=bool(quality.get("check_null_values", True)),
        ),
    )


def load_config_from_secret(fetch_secret, fallback=default_config) -> PipelineConfig:
    """Remote-secret config load with fallback (op 1's primary path).

    `fetch_secret() -> dict | str` is the injectable transport — a real
    deployment wires its secret-store client here; tests wire a fixture.
    Mirrors the reference's behavior: on any fetch/parse failure, fall
    back to the in-code registry rather than failing the pipeline
    (lambda/lambda_function.py:151-185). No cloud SDK dependency.
    """
    try:
        raw = fetch_secret()
        if isinstance(raw, str):
            raw = json.loads(raw)
        return config_from_secret_dict(raw)
    except Exception:  # noqa: BLE001 — reference parity: fallback, not fail
        return fallback()


def load_config(path: str) -> PipelineConfig:
    """Load a registry from a JSON file shaped like the reference's
    config.json `data_sources` block."""
    with open(path) as f:
        raw = json.load(f)
    sources = {}
    for name, sc in raw.get("data_sources", {}).items():
        retry_raw = raw.get("retry_config", {})
        sources[name] = SourceConfig(
            name=name,
            url=sc["url"],
            limit_param=sc.get("limit_param", "limit"),
            default_limit=int(sc.get("default_limit", 10)),
            max_records=int(sc.get("max_records", 100)),
            timeout=float(sc.get("timeout", 30)),
            retry=RetryConfig(
                max_retries=int(retry_raw.get("max_retries", 3)),
                retry_delay=float(retry_raw.get("retry_delay", 5)),
                backoff_multiplier=float(retry_raw.get("backoff_multiplier", 2)),
            ),
        )
    proc = raw.get("processing", {})
    out = raw.get("output_config", {})
    return PipelineConfig(
        sources=sources,
        output=OutputConfig(
            partition_by=tuple(out.get("partition_by", ("source", "extracted_date"))),
            compression=out.get("compression", "snappy"),
            fmt=out.get("format", "parquet"),
        ),
        processing=ProcessingConfig(
            batch_size=int(proc.get("batch_size", 100)),
            error_handling=proc.get("error_handling", "continue"),
            remove_duplicates=bool(proc.get("remove_duplicates", True)),
            validate_schema=bool(proc.get("validate_schema", True)),
            check_null_values=bool(proc.get("check_null_values", True)),
        ),
    )
