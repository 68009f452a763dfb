"""Schema-analysis scalar helpers — exact Python twins of the
reference's analysis package, shared by the Spark UDF specs and the BDD
parity harness.

- ``to_snake_case`` / ``normalize_field_name``
  (internal/analysis/fields.go:245-262, fuzzy.go:96-112)
- ``naming_variants`` (fuzzy.go:58-95)
- ``fuzzy_score`` — 1 - levenshtein/maxlen, lowercased (fuzzy.go:41-56)
- ``score_schema_quality`` — the 4-category / 100-point scorer with
  integer-division category scores and A-F grading
  (internal/analysis/quality.go:25-141)
- ``complexity_grade`` — field-count/depth grading
  (internal/api/handlers/analysis.go:520-537)
"""

from __future__ import annotations

from typing import Any


def to_snake_case(name: str) -> str:
    out = []
    for i, ch in enumerate(name):
        if ch in "-. ":
            out.append("_")
            continue
        if ch.isupper() and i > 0 and (name[i - 1].islower()
                                       or name[i - 1].isdigit()):
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


normalize_field_name = to_snake_case


def naming_variants(name: str) -> list[str]:
    parts = to_snake_case(name).split("_")
    snake = "_".join(parts)
    camel = "".join(
        p.lower() if i == 0 else (p[:1].upper() + p[1:])
        for i, p in enumerate(parts))
    pascal = "".join(p[:1].upper() + p[1:] for p in parts)
    kebab = "-".join(parts)
    seen: list[str] = []
    for v in (snake, camel, pascal, kebab):
        if v not in seen:
            seen.append(v)
    return seen


def fuzzy_score(query: str, target: str) -> float:
    q, t = query.lower(), target.lower()
    if q == t:
        return 1.0
    if not q and not t:
        return 1.0
    prev = list(range(len(t) + 1))
    for i, cq in enumerate(q, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (cq != ct)))
        prev = cur
    return 1.0 - prev[-1] / max(len(q), len(t))


def _is_good_field_name(name: str) -> bool:
    if not name:
        return False
    return not any(ch.isupper() or ch in "- " for ch in name)


_GENERIC_TYPES = {"string", "bytes", "any", "object"}


def score_schema_quality(fields: list[dict[str, Any]], schema_str: str,
                         schema_type: str) -> dict[str, Any]:
    """4-category 100-point quality scorer (quality.go:25-141).

    ``fields`` rows carry name/type/doc/has_default as produced by
    ``registry.fields.extract_fields``.  Category scores use INTEGER
    division exactly like the Go (25 * good // n).
    """
    categories: dict[str, dict[str, Any]] = {}
    quick_wins: list[str] = []
    n = len(fields)

    naming: dict[str, Any] = {"max_score": 25, "details": []}
    good = 0
    for f in fields:
        if _is_good_field_name(f.get("name") or ""):
            good += 1
        else:
            naming["details"].append(
                f"Field '{f['name']}' does not follow snake_case "
                "convention")
            quick_wins.append(
                f"Rename '{f['name']}' to "
                f"'{normalize_field_name(f['name'])}'")
    naming["score"] = 25 * good // n if n else 25
    categories["naming"] = naming

    docs: dict[str, Any] = {"max_score": 25, "details": []}
    documented = sum(1 for f in fields if f.get("doc"))
    if n:
        docs["score"] = 25 * documented // n
        if documented == 0:
            docs["details"].append("No fields have documentation")
            quick_wins.append("Add documentation/descriptions to fields")
        elif documented < n:
            docs["details"].append("Only some fields have documentation")
    else:
        docs["score"] = 25
    categories["documentation"] = docs

    type_safety: dict[str, Any] = {"max_score": 25, "details": []}
    safe = 0
    for f in fields:
        if (f.get("type") or "").lower() not in _GENERIC_TYPES:
            safe += 1
        else:
            type_safety["details"].append(
                f"Field '{f['name']}' uses generic type '{f['type']}'")
    type_safety["score"] = 25 * safe // n if n else 25
    categories["type_safety"] = type_safety

    evolution: dict[str, Any] = {"max_score": 25, "details": []}
    ev = 0
    with_defaults = sum(1 for f in fields if f.get("has_default"))
    if n and with_defaults:
        ev += 10
        evolution["details"].append(
            "Fields with defaults enable backward-compatible evolution")
    elif n:
        evolution["details"].append(
            "No fields have default values; consider adding defaults "
            "for evolution safety")
        quick_wins.append("Add default values to optional fields")
    if "namespace" in schema_str or "package" in schema_str:
        ev += 8
    else:
        evolution["details"].append(
            "No namespace/package declaration found")
        quick_wins.append("Add a namespace to prevent naming conflicts")
    if '"doc"' in schema_str or '"description"' in schema_str:
        ev += 7
    else:
        evolution["details"].append(
            "Schema-level documentation is missing")
    evolution["score"] = ev
    categories["evolution"] = evolution

    overall = sum(c["score"] for c in categories.values())
    max_score = sum(c["max_score"] for c in categories.values())
    pct = 100 * overall // max_score if max_score else 0
    grade = ("A" if pct >= 90 else "B" if pct >= 80 else
             "C" if pct >= 70 else "D" if pct >= 60 else "F")
    out = {"overall_score": overall, "max_score": max_score,
           "grade": grade, "categories": categories}
    if quick_wins:
        out["quick_wins"] = quick_wins
    return out


def complexity_grade(fields: list[dict[str, Any]]) -> dict[str, Any]:
    """Field-count/depth complexity grade (handlers/analysis.go:520-537)."""
    max_depth = max((str(f.get("path") or "").count(".") + 1
                     for f in fields), default=0)
    n = len(fields)
    if n > 50 or max_depth > 5:
        grade = "D"
    elif n > 30 or max_depth > 4:
        grade = "C"
    elif n > 15 or max_depth > 3:
        grade = "B"
    else:
        grade = "A"
    return {"field_count": n, "max_depth": max_depth, "grade": grade}
