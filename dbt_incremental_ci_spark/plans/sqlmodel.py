"""dbt-style SQL-text models: author a model as a SQL string with
``{{ ref('x') }}`` / ``{{ source('s', 't') }}`` / ``{{ config(...) }}``
and register it on the engine — the closest-to-verbatim porting path
for an existing dbt project (the reference's authoring surface,
SURVEY §3.1).

Rendering is compile-time only, like dbt: config is parsed into Model
fields, refs/sources inline to names the engine exposes as temp views,
``is_incremental()`` blocks are kept or stripped depending on whether
the target table exists, and the frozen ``run_date`` substitutes
``current_date``/``current_timestamp`` for deterministic output.
"""

from __future__ import annotations

import ast
import re

from dbt_incremental_ci_spark.plans.registry import Model, ModelRegistry

_REF = re.compile(r"\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}")
_SOURCE = re.compile(r"\{\{\s*source\(\s*'[^']+'\s*,\s*'([^']+)'\s*\)\s*\}\}")
_CONFIG = re.compile(r"\{\{\s*config\((.*?)\)\s*\}\}", re.S)
_THIS = re.compile(r"\{\{\s*this\s*\}\}")
_INCR_BLOCK = re.compile(
    r"\{%\s*if is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}", re.S
)


def _parse_config(sql: str) -> dict:
    m = _CONFIG.search(sql)
    if not m:
        return {}
    # config args are python-literal-ish kwargs: materialized='table', …
    try:
        call = ast.parse(f"f({m.group(1)})", mode="eval").body
        return {kw.arg: ast.literal_eval(kw.value) for kw in call.keywords}
    except (SyntaxError, ValueError) as e:
        raise ValueError(f"unparseable config block: {m.group(1)!r}") from e


def extract_deps(sql: str) -> list[str]:
    return sorted(set(_REF.findall(sql)) | set(_SOURCE.findall(sql)))


def register_sql_model(
    reg: ModelRegistry, name: str, sql: str, **overrides
) -> None:
    """Register a Jinja-SQL model. Config keys recognized:
    ``materialized``, ``unique_key``, ``schema``, ``on_schema_change``
    (same names as dbt). ``overrides`` win over the config block."""
    cfg = _parse_config(sql)
    fields = {
        k: cfg[k]
        for k in ("materialized", "unique_key", "schema", "on_schema_change")
        if k in cfg
    }
    fields.update(overrides)
    deps = extract_deps(sql)

    def builder(ctx, _sql=sql, _name=name):
        rendered = _CONFIG.sub("", _sql)
        target = ctx.this(_name)
        if target is None:
            rendered = _INCR_BLOCK.sub("", rendered)  # first run: full build
        else:
            rendered = _INCR_BLOCK.sub(r"\1", rendered)
            # register {{ this }} as a resolvable view
            target.createOrReplaceTempView(f"__this_{_name}")
            rendered = _THIS.sub(f"__this_{_name}", rendered)
        rendered = _REF.sub(r"\1", rendered)
        rendered = _SOURCE.sub(r"\1", rendered)
        rendered = re.sub(r"\bcurrent_date\b", f"DATE '{ctx.run_date}'", rendered)
        rendered = re.sub(
            r"\bcurrent_timestamp\b",
            f"TIMESTAMP '{ctx.run_date} 00:00:00'",
            rendered,
        )
        # make every dependency visible to spark.sql by bare name
        for dep in deps:
            ctx.ref(dep).createOrReplaceTempView(dep)
        return ctx.spark.sql(rendered)

    reg.register(Model(name=name, builder=builder, deps=deps, **fields))
