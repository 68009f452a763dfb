"""Protobuf wire-compatibility checker.

Fields are matched by NUMBER (not name); the rules mirror the reference's
checker (/root/reference/internal/compatibility/protobuf/checker.go —
wire-type groups :361-374, enum↔varint :392-413, required add/remove
:180-183,251-253, oneof moves :166-257, cardinality :288-314, nested
messages :477-640), re-derived from the public protobuf wire-format
rules:

reader = NEW schema reading; writer = OLD schema that wrote the data.

- a field number present in both must stay in the same wire-type group;
  enums interchange with varint ints; string↔bytes interchange.
- message-typed fields compare structurally (recursion by type name).
- proto2: reader adding a REQUIRED field the writer lacks is incompatible;
  reader requiring a field the writer had optional is incompatible.
- cardinality (singular↔repeated) changes are incompatible except for the
  wire-equivalent string/bytes/message packing exception.
- moving a field in/out of a oneof is flagged (unknown-field semantics
  differ); renames are fine (numbers rule).
"""

from __future__ import annotations

from axonops_schema_registry_spark.registry.protobuf_parse import (
    SCALARS,
    WIRE_GROUPS,
    ProtoFile,
    ProtoMessage,
    parse_proto,
)


def _wire_group(ftype: str, file: ProtoFile, scope: ProtoMessage | None) -> str:
    if ftype in WIRE_GROUPS:
        return WIRE_GROUPS[ftype]
    # enums ride varint; messages/maps are length-delimited
    if _find_enum(ftype, file, scope) is not None:
        return "varint"
    return "lendelim"


def _find_enum(name: str, file: ProtoFile, scope: ProtoMessage | None):
    short = name.split(".")[-1]
    if scope is not None and short in scope.enums:
        return scope.enums[short]
    return file.enums.get(short)


def _find_message(name: str, file: ProtoFile,
                  scope: ProtoMessage | None) -> ProtoMessage | None:
    short = name.split(".")[-1]
    if scope is not None and short in scope.messages:
        return scope.messages[short]
    return file.messages.get(short)


def check_protobuf(reader_text: str, writer_text: str) -> list[str]:
    reader = parse_proto(reader_text)
    writer = parse_proto(writer_text)
    issues: list[str] = []
    for name, wmsg in writer.messages.items():
        rmsg = reader.messages.get(name)
        if rmsg is None:
            # structural compare across packages: single-message files match
            # positionally (checker.go:423)
            if len(writer.messages) == 1 and len(reader.messages) == 1:
                rmsg = next(iter(reader.messages.values()))
            else:
                issues.append(f"message '{name}' removed in reader")
                continue
        _check_message(rmsg, wmsg, reader, writer, name, issues)
    return issues


def _check_message(rmsg: ProtoMessage, wmsg: ProtoMessage,
                   rfile: ProtoFile, wfile: ProtoFile,
                   path: str, issues: list[str],
                   visited: set[tuple[str, str]] | None = None) -> None:
    # recursion guard keyed on the (reader, writer) type-name pair — a legal
    # self-referential message (message Node { Node next = 1; }) must
    # terminate, mirroring the Avro checker's guard
    if visited is None:
        visited = set()
    key = (rmsg.name, wmsg.name)
    if key in visited:
        return
    visited.add(key)
    for num, wf in wmsg.fields.items():
        rf = rmsg.fields.get(num)
        at = f"{path}.{wf.name}#{num}"
        if rf is None:
            if wf.label == "required" and rfile.syntax == "proto2":
                issues.append(f"{at}: required field removed by reader")
            continue  # removed optional field: unknown-field, fine
        # wire group
        wg = _wire_group(wf.type, wfile, wmsg)
        rg = _wire_group(rf.type, rfile, rmsg)
        if wg != rg:
            issues.append(
                f"{at}: wire type changed {wf.type}({wg}) → {rf.type}({rg})")
            continue
        # message-typed: recurse structurally
        wsub = _find_message(wf.type, wfile, wmsg) \
            if wf.type not in SCALARS else None
        rsub = _find_message(rf.type, rfile, rmsg) \
            if rf.type not in SCALARS else None
        if (wsub is None) != (rsub is None):
            issues.append(f"{at}: message/scalar kind changed "
                          f"{wf.type} → {rf.type}")
        elif wsub is not None and rsub is not None:
            _check_message(rsub, wsub, rfile, wfile, f"{path}.{wf.name}",
                           issues, visited)
        # enum compatibility: numbers are what travel; removing a value the
        # writer emits is flagged
        wenum = _find_enum(wf.type, wfile, wmsg)
        renum = _find_enum(rf.type, rfile, rmsg)
        if wenum is not None and renum is not None:
            missing = set(wenum.values()) - set(renum.values())
            if missing:
                issues.append(f"{at}: enum numbers {sorted(missing)} "
                              f"removed in reader")
        # cardinality
        w_rep = wf.label in ("repeated", "map")
        r_rep = rf.label in ("repeated", "map")
        if w_rep != r_rep:
            # string/bytes/message exception: wire-compatible packing
            if wf.type in ("string", "bytes") or wsub is not None:
                pass
            else:
                issues.append(f"{at}: cardinality changed "
                              f"{wf.label} → {rf.label}")
        # required tightening (proto2)
        if rf.label == "required" and wf.label != "required":
            issues.append(f"{at}: reader requires previously-optional field")
        # oneof moves
        if (wf.oneof is None) != (rf.oneof is None):
            issues.append(f"{at}: field moved "
                          f"{'into' if rf.oneof else 'out of'} a oneof")
    # new required fields in reader (proto2)
    if rfile.syntax == "proto2":
        for num, rf in rmsg.fields.items():
            if num not in wmsg.fields and rf.label == "required":
                issues.append(f"{path}.{rf.name}#{num}: reader adds "
                              f"required field absent from writer")
