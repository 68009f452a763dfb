"""Minimal Protobuf text-format (.proto) parser.

Parses proto2/proto3 message definitions into a structural model good
enough for field extraction and wire-compatibility checking — the same
scope the reference covers with its descriptor walk
(/root/reference/internal/compatibility/protobuf/checker.go:361-374 wire
groups, :477-640 nested messages/enums).  Not a full grammar: options,
services, extensions and reserved statements are recognized and skipped.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

SCALARS = {
    "double", "float", "int32", "int64", "uint32", "uint64", "sint32",
    "sint64", "fixed32", "fixed64", "sfixed32", "sfixed64", "bool",
    "string", "bytes",
}

#: Wire-type groups: changing type *within* a group is wire-compatible
#: (checker.go:361-374).  float/double deliberately get singleton groups —
#: the reference's compatibleGroups exclude them, so float↔fixed32 and
#: double↔fixed64 are INCOMPATIBLE despite sharing a wire type (the bit
#: patterns reinterpret).
WIRE_GROUPS = {
    **{t: "varint" for t in ("int32", "int64", "uint32", "uint64", "bool")},
    **{t: "zigzag" for t in ("sint32", "sint64")},
    **{t: "fixed32" for t in ("fixed32", "sfixed32")},
    **{t: "fixed64" for t in ("fixed64", "sfixed64")},
    "float": "float", "double": "double",
    **{t: "lendelim" for t in ("string", "bytes")},
}


@dataclass
class ProtoField:
    name: str
    number: int
    type: str          # scalar name, or message/enum type name
    label: str         # optional | required | repeated | map
    oneof: str | None = None
    map_key: str | None = None
    map_value: str | None = None


@dataclass
class ProtoMessage:
    name: str
    fields: dict[int, ProtoField] = field(default_factory=dict)
    messages: dict[str, "ProtoMessage"] = field(default_factory=dict)
    enums: dict[str, dict[str, int]] = field(default_factory=dict)
    #: field numbers assigned more than once (parse stays lenient — the
    #: last definition wins in ``fields`` — validation flags these)
    duplicate_numbers: list[int] = field(default_factory=list)


@dataclass
class ProtoFile:
    syntax: str = "proto3"
    package: str = ""
    messages: dict[str, ProtoMessage] = field(default_factory=dict)
    enums: dict[str, dict[str, int]] = field(default_factory=dict)
    imports: list[str] = field(default_factory=list)


_TOKEN = re.compile(
    r"""//[^\n]*|/\*.*?\*/|"(?:\\.|[^"])*"|[{}=;<>,]|[^\s{}=;<>,]+""",
    re.DOTALL)


def _tokens(text: str) -> list[str]:
    return [t for t in _TOKEN.findall(text)
            if not t.startswith("//") and not t.startswith("/*")]


def parse_proto(text: str) -> ProtoFile:
    toks = _tokens(text)
    out = ProtoFile()
    i = 0

    def parse_enum(i: int) -> tuple[dict[str, int], int]:
        # at 'enum' NAME '{'
        name = toks[i + 1]
        assert toks[i + 2] == "{"
        i += 3
        values: dict[str, int] = {}
        while toks[i] != "}":
            if toks[i] == "option" or toks[i] == "reserved":
                while toks[i] != ";":
                    i += 1
                i += 1
                continue
            # NAME = N ;
            vname = toks[i]
            if toks[i + 1] == "=":
                values[vname] = int(toks[i + 2])
                i += 3
                while toks[i] != ";":
                    i += 1  # skip value options [(...)]
                i += 1
            else:
                i += 1
        return {name: values}, i + 1

    def parse_message(i: int) -> tuple[ProtoMessage, int]:
        # at 'message' NAME '{'
        msg = ProtoMessage(name=toks[i + 1])
        assert toks[i + 2] == "{"
        i += 3
        oneof: str | None = None
        depth_oneof = False
        while True:
            t = toks[i]
            if t == "}":
                if depth_oneof:
                    depth_oneof = False
                    oneof = None
                    i += 1
                    continue
                return msg, i + 1
            if t == "message":
                sub, i = parse_message(i)
                msg.messages[sub.name] = sub
                continue
            if t == "enum":
                ed, i = parse_enum(i)
                msg.enums.update(ed)
                continue
            if t == "oneof":
                oneof = toks[i + 1]
                assert toks[i + 2] == "{"
                depth_oneof = True
                i += 3
                continue
            if t in ("option", "reserved", "extensions"):
                while toks[i] != ";":
                    i += 1
                i += 1
                continue
            # field: [label] type name = number [options] ;
            label = "optional"
            if t in ("optional", "required", "repeated"):
                label = t
                i += 1
                t = toks[i]
            if t == "map":
                # map < k , v > name = number
                assert toks[i + 1] == "<"
                k, v = toks[i + 2], toks[i + 4]
                fname = toks[i + 6]
                assert toks[i + 7] == "="
                num = int(toks[i + 8])
                if num in msg.fields:
                    msg.duplicate_numbers.append(num)
                msg.fields[num] = ProtoField(fname, num, "map", "map",
                                             oneof, k, v)
                i += 9
            else:
                ftype = t
                fname = toks[i + 1]
                assert toks[i + 2] == "=", f"bad field at {toks[i:i+4]}"
                num = int(toks[i + 3])
                if num in msg.fields:
                    msg.duplicate_numbers.append(num)
                msg.fields[num] = ProtoField(fname, num, ftype, label, oneof)
                i += 4
            while toks[i] != ";":
                i += 1  # skip field options
            i += 1

    while i < len(toks):
        t = toks[i]
        if t == "syntax":
            out.syntax = toks[i + 2].strip('"')
            i += 4
        elif t == "package":
            out.package = toks[i + 1]
            i += 3
        elif t == "import":
            while toks[i] != ";":
                if toks[i].startswith('"'):
                    out.imports.append(toks[i].strip('"'))
                i += 1
            i += 1
        elif t == "option":
            while toks[i] != ";":
                i += 1
            i += 1
        elif t == "message":
            msg, i = parse_message(i)
            out.messages[msg.name] = msg
        elif t == "enum":
            ed, i = parse_enum(i)
            out.enums.update(ed)
        else:
            i += 1
    return out


def proto_validate(pf: ProtoFile,
                   known_imports: tuple[str, ...] = ()) -> None:
    """Raise ValueError for .proto files the reference's compiler rejects
    (INVALID_SCHEMA 42201): duplicate field numbers within a message, and
    imports that resolve to neither a well-known google/protobuf file nor
    a declared schema reference (modeling_negative_validation.feature)."""
    for imp in pf.imports:
        if imp.startswith("google/protobuf/"):
            continue  # standard imports ship with the compiler
        if imp not in known_imports:
            raise ValueError(f"import '{imp}' has no matching schema "
                             f"reference")

    def walk(msg: ProtoMessage, path: str) -> None:
        if msg.duplicate_numbers:
            raise ValueError(
                f"duplicate field number(s) {sorted(set(msg.duplicate_numbers))} "
                f"in message '{path}'")
        for sub in msg.messages.values():
            walk(sub, f"{path}.{sub.name}")

    for m in pf.messages.values():
        walk(m, m.name)
