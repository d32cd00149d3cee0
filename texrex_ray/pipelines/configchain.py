"""INI-configured processor chain — the reference's user-extension surface.

texrex processors subclass ``TTrDocumentProcessor`` and declare
``Achieves`` / ``Presupposes`` (ref: trdocumentprocessor.pas:57-73); the
application validates at startup that every stage's presuppositions are
achieved by an earlier stage, and configures each processor from the INI
section named after its class via RTTI property binding (``TrReadProps``,
ref: trutilities.pas:283-352; user surface: data/texrex.ini).  The Ray
rebuild keeps both halves:

* a **stage registry** — name → (batch fn or actor class) + typed,
  defaulted params + achieves/presupposes/removes fact sets;
* an **INI reader** — ``[texrex] chain = A, B, C`` picks and orders
  stages, ``[StageName]`` sections bind their params (types coerced from
  the declared defaults, unknown stages/params are hard errors), and the
  composed chain is validated before any data moves.

Facts are data-shape invariants ("tokens exist"), so a chain that puts
``Fingerprints`` after ``DropTokens`` fails at compose time with the
stage that would have satisfied the missing fact — the reference's
startup chain check, not a mid-pipeline KeyError at scale.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data


class ChainConfigError(ValueError):
    """Raised for unknown stages/params or unsatisfiable chain ordering."""


@dataclass(frozen=True)
class StageSpec:
    """One registered processor: how to build it and what it needs/gives."""

    name: str
    build: Callable[..., Any]  # params -> batch fn, or (cls, args, kwargs)
    params: dict[str, Any] = field(default_factory=dict)  # name -> default
    presupposes: frozenset[str] = frozenset()
    achieves: frozenset[str] = frozenset()
    removes: frozenset[str] = frozenset()
    actor_param: str | None = None  # param that switches to an actor pool
    build_actor: Callable[..., tuple] | None = None  # params -> (cls, args, kwargs)


def _secondpass_spec() -> StageSpec:
    from texrex_ray.stages import textchain as tc

    return StageSpec(
        "SecondPass", lambda: tc.secondpass,
        presupposes=frozenset({"text"}), achieves=frozenset({"cleansed"}),
    )


def _normalizer_spec() -> StageSpec:
    from texrex_ray.stages import textchain as tc

    return StageSpec(
        "Normalizer", lambda: tc.normalize,
        presupposes=frozenset({"cleansed"}), achieves=frozenset({"normalized"}),
    )


def _tokenizer_spec() -> StageSpec:
    from texrex_ray.stages import textchain as tc

    return StageSpec(
        "Tokenizer", lambda: tc.tokenize_stage,
        presupposes=frozenset({"normalized"}), achieves=frozenset({"tokens"}),
    )


def _quality_spec() -> StageSpec:
    from texrex_ray.stages import textchain as tc

    return StageSpec(
        "Quality", lambda: tc.quality,
        presupposes=frozenset({"tokens"}), achieves=frozenset({"quality"}),
    )


def _assessor_spec() -> StageSpec:
    from texrex_ray.sources.profiles import default_profiles
    from texrex_ray.stages import textchain as tc

    def build(threshold: float = 5.0):
        return tc.Assessor(default_profiles(), threshold=threshold)

    def build_actor(threshold: float = 5.0):
        return (
            tc.Assessor,
            (default_profiles(),),
            {"threshold": threshold},
        )

    return StageSpec(
        "Assessor", build,
        params={"threshold": 5.0, "concurrency": 0},
        # reads the `valid` kill-flag Quality computes (the reference's
        # SimpleDocumentFilter→TextAssessment ordering, trworker.pas chain)
        presupposes=frozenset({"tokens", "quality"}),
        achieves=frozenset({"badness"}),
        actor_param="concurrency", build_actor=build_actor,
    )


def _fingerprints_spec() -> StageSpec:
    from texrex_ray.stages import textchain as tc

    def build(minhash_k: int = 100, ngram: int = 5):
        return lambda b: tc.fingerprints(b, k=minhash_k, ngram=ngram)

    return StageSpec(
        "Fingerprints", build,
        params={"minhash_k": 100, "ngram": 5},
        presupposes=frozenset({"tokens"}), achieves=frozenset({"fingerprints"}),
    )


def _drop_tokens_spec() -> StageSpec:
    from texrex_ray.stages import textchain as tc

    return StageSpec(
        "DropTokens", lambda: tc.drop_tokens,
        presupposes=frozenset({"tokens"}), removes=frozenset({"tokens"}),
    )


REGISTRY: dict[str, Callable[[], StageSpec]] = {
    "SecondPass": _secondpass_spec,
    "Normalizer": _normalizer_spec,
    "Tokenizer": _tokenizer_spec,
    "Quality": _quality_spec,
    "Assessor": _assessor_spec,
    "Fingerprints": _fingerprints_spec,
    "DropTokens": _drop_tokens_spec,
}

DEFAULT_CHAIN = (
    "SecondPass, Normalizer, Tokenizer, Quality, Assessor, Fingerprints, DropTokens"
)


def _coerce(name: str, stage: str, raw: str, default: Any) -> Any:
    try:
        if isinstance(default, bool):
            low = raw.strip().lower()
            if low in ("1", "true", "yes", "on"):
                return True
            if low in ("0", "false", "no", "off"):
                return False
            raise ValueError(raw)
        return type(default)(raw)
    except (TypeError, ValueError):
        raise ChainConfigError(
            f"[{stage}] {name} = {raw!r}: expected {type(default).__name__}"
        ) from None


def parse_chain(ini_text: str) -> tuple[list[tuple[StageSpec, dict]], int]:
    """INI text → validated [(spec, bound_params)...] + batch_size.

    Validation mirrors the reference's startup check: walking the chain,
    every stage's presuppositions must already be achieved (starting fact
    set: {"text"} — the input column), and stages may remove facts.
    """
    cp = configparser.ConfigParser()
    cp.read_string(ini_text)
    chain_str = cp.get("texrex", "chain", fallback=DEFAULT_CHAIN)
    batch_size = cp.getint("texrex", "batch_size", fallback=4096)

    stages: list[tuple[StageSpec, dict]] = []
    for raw_name in (s.strip() for s in chain_str.split(",")):
        if not raw_name:
            continue
        if raw_name not in REGISTRY:
            raise ChainConfigError(
                f"unknown stage {raw_name!r}; known: {', '.join(sorted(REGISTRY))}"
            )
        spec = REGISTRY[raw_name]()
        bound = dict(spec.params)
        if cp.has_section(raw_name):
            for k, v in cp.items(raw_name):
                if k not in spec.params:
                    raise ChainConfigError(
                        f"[{raw_name}] has no parameter {k!r}; "
                        f"known: {', '.join(sorted(spec.params)) or '(none)'}"
                    )
                bound[k] = _coerce(k, raw_name, v, spec.params[k])
        stages.append((spec, bound))

    facts: set[str] = {"text"}
    achieved_by: dict[str, str] = {"text": "(input)"}
    for spec, _ in stages:
        missing = spec.presupposes - facts
        if missing:
            hints = []
            for fact in sorted(missing):
                who = [n for n in REGISTRY if fact in REGISTRY[n]().achieves]
                removed = fact in achieved_by and fact not in facts
                hints.append(
                    f"{fact!r} ({'removed by an earlier stage' if removed else 'never achieved'};"
                    f" achieved by {', '.join(who) or '(nothing)'})"
                )
            raise ChainConfigError(
                f"stage {spec.name} presupposes " + "; ".join(hints)
            )
        for fact in spec.achieves:
            facts.add(fact)
            achieved_by[fact] = spec.name
        facts -= spec.removes
    return stages, batch_size


def apply_chain(
    ds: ray.data.Dataset,
    stages: list[tuple[StageSpec, dict]],
    *,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """Compose the validated chain as fused ``map_batches`` stages; a stage
    whose ``actor_param`` binds > 0 becomes an actor pool of that size."""
    kw = dict(batch_format="pyarrow", batch_size=batch_size)
    for spec, params in stages:
        p = dict(params)
        conc = int(p.pop(spec.actor_param, 0)) if spec.actor_param else 0
        if conc > 0:
            assert spec.build_actor is not None, spec.name
            cls, args, ckw = spec.build_actor(**p)
            ds = ds.map_batches(
                cls, fn_constructor_args=args, fn_constructor_kwargs=ckw,
                concurrency=conc, **kw,
            )
        else:
            ds = ds.map_batches(spec.build(**p), **kw)
    return ds


def chain_from_ini(
    ds: ray.data.Dataset, ini_text: str
) -> ray.data.Dataset:
    """One-call surface: INI text → validated, composed Dataset pipeline."""
    stages, batch_size = parse_chain(ini_text)
    return apply_chain(ds, stages, batch_size=batch_size)
