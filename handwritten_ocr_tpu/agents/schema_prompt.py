"""Render a human-readable JSON example from a pydantic model class.

The rendered text is embedded in agent prompts so the LLM sees the expected
shape. Output text matches the reference renderer (agents.py:73-126)
exactly — e.g. for ``CriticResult``::

    {
      "overall_confidence": <0-100>,
      ...
      "verdict": "accept" | "needs_editing" | "needs_reocr",
    }

Unlike the reference (which round-trips through ``json.dumps`` with a ``§``
sentinel and regex-unescapes), this renderer emits the text directly via a
recursive pretty-printer with unquoted placeholder tokens.
"""

from __future__ import annotations

from typing import Literal, get_args, get_origin

from pydantic import BaseModel

_INDENT = 2


def schema_example(model: type[BaseModel]) -> str:
    """Human-readable JSON example for ``model``."""
    return "\n".join(_render_model(model, depth=0))


def _placeholder_token(annotation, field_info=None) -> str:
    """Unquoted placeholder text for a scalar annotation."""
    if get_origin(annotation) is Literal:
        return " | ".join(f'"{v}"' for v in get_args(annotation))
    if annotation is int:
        if field_info is not None:
            lo = next((m.ge for m in field_info.metadata
                       if getattr(m, "ge", None) is not None), None)
            hi = next((m.le for m in field_info.metadata
                       if getattr(m, "le", None) is not None), None)
            if lo is not None and hi is not None:
                return f"<{lo}-{hi}>"
        return "<integer>"
    if annotation is str:
        return "<string>"
    return "<value>"


def _render_value(annotation, field_info, depth: int) -> list[str]:
    """Lines for one value; the first line carries no indentation prefix."""
    if get_origin(annotation) is list:
        (inner,) = get_args(annotation)
        inner_lines = _render_value(inner, None, depth + 1)
        pad = " " * (_INDENT * (depth + 1))
        return ["[", pad + inner_lines[0], *inner_lines[1:], " " * (_INDENT * depth) + "]"]
    if isinstance(annotation, type) and issubclass(annotation, BaseModel):
        return _render_model(annotation, depth)
    return [_placeholder_token(annotation, field_info)]


def _render_model(model: type[BaseModel], depth: int) -> list[str]:
    pad = " " * (_INDENT * (depth + 1))
    lines = ["{"]
    fields = list(model.model_fields.items())
    for idx, (name, info) in enumerate(fields):
        value_lines = _render_value(info.annotation, info, depth + 1)
        comma = "," if idx < len(fields) - 1 else ""
        lines.append(f'{pad}"{name}": {value_lines[0]}' + ("" if len(value_lines) > 1 else comma))
        if len(value_lines) > 1:
            lines.extend(value_lines[1:-1])
            lines.append(value_lines[-1] + comma)
    lines.append(" " * (_INDENT * depth) + "}")
    return lines
