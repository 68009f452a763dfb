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
    ProtoField,
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
    # a text that yields no definitions did not parse as protobuf at
    # all (e.g. an Avro/JSON schema registered cross-type); the
    # reference's proto checker fails the parse and reports
    # incompatible (checker.go:51-54 per-type checker dispatch)
    for label, pf in (("reader", reader), ("writer", writer)):
        if not pf.messages and not pf.enums:
            raise ValueError(
                f"{label} schema has no message or enum definitions")
    issues: list[str] = []
    # package change breaks the fully-qualified type namespace
    # (checker.go:43-46)
    if reader.package != writer.package:
        issues.append(f"package changed from '{writer.package}' "
                      f"to '{reader.package}'")
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
    moved_to_oneof: dict[str, list[ProtoField]] = {}
    for num, wf in wmsg.fields.items():
        rf = rmsg.fields.get(num)
        at = f"{path}.{wf.name}#{num}"
        if rf is None:
            if wf.label == "required":
                issues.append(f"{at}: required field removed by reader")
            elif wf.oneof is not None:
                # removing a member changes the oneof's exclusion
                # semantics (checker.go:254-257)
                issues.append(f"{at}: field removed from oneof "
                              f"'{wf.oneof}'")
            continue  # removed plain field: unknown-field, fine
        # map entries compare as their synthetic entry message: key/value
        # field pairs must stay wire-compatible (checker.go treats them
        # as MessageKind and compares structurally)
        if wf.label == "map" and rf.label == "map":
            _check_map_entry(rf, wf, rfile, rmsg, wfile, wmsg, at, issues,
                             visited)
            continue
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
        # enum-typed on both sides: the reference requires the enum TYPE
        # name to match (checker.go:351-353); value adds AND removals are
        # wire-compatible — enums are open varints, unknown numbers are
        # preserved (checker.go:571-574), so no value-set check at all
        wenum = _find_enum(wf.type, wfile, wmsg)
        renum = _find_enum(rf.type, rfile, rmsg)
        if wenum is not None and renum is not None:
            if wf.type.split(".")[-1] != rf.type.split(".")[-1]:
                issues.append(f"{at}: enum type changed "
                              f"{wf.type} → {rf.type}")
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
        # oneof membership (checker.go:317-335): OUT of a real oneof is
        # incompatible; INTO one is per-oneof aggregated below
        if wf.oneof is not None and rf.oneof is None:
            issues.append(f"{at}: field moved out of oneof '{wf.oneof}'")
        elif wf.oneof is None and rf.oneof is not None:
            moved_to_oneof.setdefault(rf.oneof, []).append(rf)
    # moved-into-oneof aggregation (checker.go:202-244): >1 previously-
    # independent field into one oneof, or joining a oneof with other
    # pre-existing members, adds a mutual-exclusion constraint
    for oneof_name, moved in moved_to_oneof.items():
        if len(moved) > 1:
            issues.append(f"{path}: multiple fields moved into oneof "
                          f"'{oneof_name}', creating mutual exclusion")
            continue
        moved_f = moved[0]
        for rf2 in rmsg.fields.values():
            if (rf2.oneof == oneof_name and rf2.number != moved_f.number
                    and rf2.number in wmsg.fields):
                issues.append(
                    f"{path}.{moved_f.name}#{moved_f.number}: field moved "
                    f"into existing oneof '{oneof_name}'")
                break
    # new required fields in reader (proto2)
    for num, rf in rmsg.fields.items():
        if num not in wmsg.fields and rf.label == "required":
            issues.append(f"{path}.{rf.name}#{num}: reader adds "
                          f"required field absent from writer")
    # nested message REMOVAL is incompatible (checker.go:499-501); nested
    # pairs also compare by name even when no field references them
    for nname, wnested in wmsg.messages.items():
        rnested = rmsg.messages.get(nname)
        if rnested is None:
            issues.append(f"{path}: nested message '{nname}' was removed")
        else:
            _check_message(rnested, wnested, rfile, wfile,
                           f"{path}.{nname}", issues, visited)
    # nested enum removal is wire-compatible (ints on the wire) — no check


def _check_map_entry(rf, wf, rfile: ProtoFile, rmsg: ProtoMessage,
                     wfile: ProtoFile, wmsg: ProtoMessage, at: str,
                     issues: list[str],
                     visited: set[tuple[str, str]]) -> None:
    for part, wtype, rtype in (("key", wf.map_key, rf.map_key),
                               ("value", wf.map_value, rf.map_value)):
        wg = _wire_group(wtype, wfile, wmsg)
        rg = _wire_group(rtype, rfile, rmsg)
        if wg != rg:
            issues.append(f"{at}: map {part} wire type changed "
                          f"{wtype}({wg}) → {rtype}({rg})")
            continue
        wsub = _find_message(wtype, wfile, wmsg) \
            if wtype not in SCALARS else None
        rsub = _find_message(rtype, rfile, rmsg) \
            if rtype not in SCALARS else None
        if (wsub is None) != (rsub is None):
            issues.append(f"{at}: map {part} message/scalar kind changed "
                          f"{wtype} → {rtype}")
        elif wsub is not None and rsub is not None:
            _check_message(rsub, wsub, rfile, wfile, f"{at}.{part}",
                           issues, visited)
