"""Config loading: YAML + ${VAR} env substitution + DAG validation.

Mirrors the reference's pipeline (reference ``app/utils/config.py:12-46``):
dotenv → regex ``${VAR}`` substitution (erroring on unset vars) → YAML →
stream selection → function hydration from a user registry → model
validation — and then closes the reference's TODO (``README.md:109``) with
real DAG validation: every step input must be produced by an earlier
step, and names may not be redefined.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Mapping
from pathlib import Path
from typing import Any

import yaml

from data_bridge_spark.plans.models import Stream

__all__ = ["load_stream_config", "substitute_env", "validate_dag", "ConfigError"]

_ENV_VAR = re.compile(r"\$\{(\w+)\}")


class ConfigError(ValueError):
    pass


def substitute_env(text: str, env: Mapping[str, str] | None = None) -> str:
    """Replace ``${VAR}`` with environment values; unset vars error
    (ref config.py:40-46)."""
    env = env if env is not None else os.environ

    def sub(m: re.Match[str]) -> str:
        key = m.group(1)
        if key not in env:
            raise ConfigError(f"environment variable {key!r} referenced in config is not set")
        return env[key]

    return _ENV_VAR.sub(sub, text)


def validate_dag(stream: Stream) -> None:
    """Every input must reference an output of an earlier step; outputs
    must be unique. (The reference executes steps in config order with no
    checking — README.md:109 admits the gap.)"""
    produced: set[str] = set()
    for step in stream.steps:
        ins: list[str]
        outs: list[str]
        if step.step_type == "extract":
            ins = [v[5:] for v in step.params.values() if isinstance(v, str) and v.startswith("step:")]
            outs = [step.output]
        elif step.step_type == "transform":
            ins, outs = list(step.input), list(step.output)
        elif step.step_type == "collect":
            ins, outs = [step.input], [step.output]
        else:  # load
            ins = [step.input] + [r[5:] for r in step.recipients if r.startswith("step:")]
            outs = []
        for i in ins:
            if i not in produced:
                raise ConfigError(
                    f"step {step.name!r} consumes {i!r}, which no earlier step produces"
                )
        for o in outs:
            if o in produced:
                raise ConfigError(f"step {step.name!r} redefines output {o!r}")
            produced.add(o)


def load_stream_config(
    stream_name: str,
    config_file: str | Path,
    functions: Mapping[str, Callable[..., dict[str, Any]]] | None = None,
    env: Mapping[str, str] | None = None,
) -> Stream:
    """Load + validate one stream from a YAML config (ref config.py:12-37).

    ``functions`` is the user's transform registry (ref
    streamfunctions.py:27-32): transform steps name a function, hydrated
    here onto the validated model.
    """
    text = Path(config_file).read_text()
    raw = yaml.safe_load(substitute_env(text, env))
    streams = raw.get("streams", {})
    if stream_name not in streams:
        raise ConfigError(f"stream {stream_name!r} not in config (has: {sorted(streams)})")
    spec = dict(streams[stream_name])
    spec.setdefault("name", stream_name)

    stream = Stream(**spec)

    functions = functions or {}
    for step in stream.steps:
        if step.step_type == "transform":
            fname = step.function_name or step.name
            if step.function is None:
                if fname not in functions:
                    raise ConfigError(
                        f"transform step {step.name!r} needs function {fname!r}, "
                        f"not found in registry (has: {sorted(functions)})"
                    )
                step.function = functions[fname]

    validate_dag(stream)
    return stream
