"""Exhaustive-style compatibility cases, modeled on the reference's BDD
suites (avro_compatibility_exhaustive.feature,
compatibility_jsonschema_*_draft07/2020.feature,
compatibility_protobuf.feature — SURVEY.md §5): one scenario per rule
family, both directions where the rule is asymmetric."""

from __future__ import annotations

import pytest

from axonops_schema_registry_spark.registry.compat import (
    check_compatibility,
    check_pair,
)


def rec(fields: str, name: str = "R") -> str:
    return f'{{"type":"record","name":"{name}","fields":[{fields}]}}'


class TestAvroExhaustive:
    @pytest.mark.parametrize("writer,reader,ok", [
        # numeric promotion lattice (writer → reader)
        ("int", "long", True), ("int", "float", True), ("int", "double", True),
        ("long", "float", True), ("long", "double", True),
        ("float", "double", True),
        ("long", "int", False), ("double", "float", False),
        ("double", "int", False), ("float", "long", False),
        # string/bytes interchange
        ("string", "bytes", True), ("bytes", "string", True),
        # non-promotable
        ("boolean", "int", False), ("int", "boolean", False),
        ("string", "int", False), ("null", "string", False),
    ])
    def test_primitive_matrix(self, writer, reader, ok):
        r = rec(f'{{"name":"v","type":"{reader}"}}')
        w = rec(f'{{"name":"v","type":"{writer}"}}')
        assert (check_pair(r, w) == []) is ok

    def test_union_to_union_subset(self):
        w = rec('{"name":"v","type":["null","string"]}')
        r_wide = rec('{"name":"v","type":["null","string","int"]}')
        r_narrow = rec('{"name":"v","type":["null"]}')
        assert check_pair(r_wide, w) == []
        assert check_pair(r_narrow, w) != []

    def test_union_branch_promotion(self):
        w = rec('{"name":"v","type":["null","int"]}')
        r = rec('{"name":"v","type":["null","long"]}')
        assert check_pair(r, w) == []

    def test_nested_record_field_removal(self):
        inner_v1 = ('{"type":"record","name":"Inner","fields":'
                    '[{"name":"a","type":"string"},'
                    '{"name":"b","type":"int"}]}')
        inner_v2 = ('{"type":"record","name":"Inner","fields":'
                    '[{"name":"a","type":"string"}]}')
        w = rec(f'{{"name":"in","type":{inner_v1}}}')
        r = rec(f'{{"name":"in","type":{inner_v2}}}')
        assert check_pair(r, w) == []      # reader dropped b: fine
        assert check_pair(w, r) != []      # reader needs b, no default

    def test_array_and_map_item_promotion(self):
        w = rec('{"name":"xs","type":{"type":"array","items":"int"}}')
        r = rec('{"name":"xs","type":{"type":"array","items":"long"}}')
        assert check_pair(r, w) == []
        assert check_pair(w, r) != []
        wm = rec('{"name":"m","type":{"type":"map","values":"int"}}')
        rm = rec('{"name":"m","type":{"type":"map","values":"double"}}')
        assert check_pair(rm, wm) == []

    def test_record_vs_primitive(self):
        w = rec('{"name":"v","type":"string"}')
        r = ('{"type":"record","name":"R","fields":[{"name":"v","type":'
             '{"type":"record","name":"N","fields":[]}}]}')
        assert check_pair(r, w) != []

    def test_enum_default_saves_unknown_symbol(self):
        w = rec('{"name":"e","type":{"type":"enum","name":"E",'
                '"symbols":["A","B","C"]}}')
        r_with_default = rec(
            '{"name":"e","type":{"type":"enum","name":"E",'
            '"symbols":["A"],"default":"A"}}')
        assert check_pair(r_with_default, w) == []

    def test_doc_and_order_changes_are_compatible(self):
        w = ('{"type":"record","name":"R","doc":"x","fields":'
             '[{"name":"a","type":"string","doc":"f"},'
             '{"name":"b","type":"int"}]}')
        r = ('{"type":"record","name":"R","fields":'
             '[{"name":"b","type":"int"},'
             '{"name":"a","type":"string"}]}')
        assert check_pair(r, w) == []


def obj(props: str, extra: str = "") -> str:
    return f'{{"type":"object","properties":{{{props}}}{extra}}}'


class TestJsonSchemaExhaustive:
    def test_allof_components_apply(self):
        r = ('{"allOf":[{"type":"object","properties":'
             '{"a":{"type":"string"}}},'
             '{"type":"object","required":["b"],"properties":{"b":{}}}]}')
        w = obj('"a":{"type":"string"},"b":{}')
        issues = check_pair(r, w, "JSON")
        assert issues and "newly required" in " ".join(issues)

    def test_writer_oneof_every_branch_checked(self):
        w = ('{"oneOf":[{"type":"string"},{"type":"integer"}]}')
        r_str_only = '{"type":"string"}'
        r_both = '{"type":["string","integer"]}'
        assert check_pair(r_str_only, w, "JSON") != []
        assert check_pair(r_both, w, "JSON") == []

    def test_reader_anyof_needs_one_accepting_branch(self):
        w = '{"type":"integer"}'
        r = '{"anyOf":[{"type":"string"},{"type":"number"}]}'
        assert check_pair(r, w, "JSON") == []  # number branch accepts int

    def test_bounds_widening_ok_narrowing_not(self):
        w = obj('"v":{"type":"integer","minimum":0,"maximum":10}')
        r_wide = obj('"v":{"type":"integer","minimum":-5,"maximum":20}')
        r_narrow = obj('"v":{"type":"integer","minimum":5,"maximum":10}')
        assert check_pair(r_wide, w, "JSON") == []
        assert check_pair(r_narrow, w, "JSON") != []

    def test_multiple_of_division(self):
        w = obj('"v":{"type":"integer","multipleOf":10}')
        r_ok = obj('"v":{"type":"integer","multipleOf":5}')   # 10 % 5 == 0
        r_bad = obj('"v":{"type":"integer","multipleOf":3}')
        assert check_pair(r_ok, w, "JSON") == []
        assert check_pair(r_bad, w, "JSON") != []

    def test_tuple_items(self):
        w = '{"type":"array","items":[{"type":"string"},{"type":"integer"}]}'
        r_same = '{"type":"array","items":[{"type":"string"},{"type":"number"}]}'
        r_narrow = ('{"type":"array","items":[{"type":"string"}],'
                    '"additionalItems":false}')
        assert check_pair(r_same, w, "JSON") == []
        assert check_pair(r_narrow, w, "JSON") != []

    def test_dependent_schemas(self):
        r = ('{"type":"object","properties":{"a":{},"b":{"type":"string"}},'
             '"dependentSchemas":{"a":{"properties":'
             '{"b":{"type":"string","maxLength":3}}}}}')
        w = ('{"type":"object","properties":{"a":{},"b":{"type":"string"}},'
             '"dependentSchemas":{"a":{"properties":'
             '{"b":{"type":"string","maxLength":10}}}}}')
        assert check_pair(w, r, "JSON") == []   # widening maxLength: ok
        assert check_pair(r, w, "JSON") != []   # narrowing: not


def proto(body: str, syntax: str = "proto3") -> str:
    return f'syntax = "{syntax}";\nmessage M {{\n{body}\n}}\n'


class TestProtobufExhaustive:
    @pytest.mark.parametrize("wt,rt,ok", [
        ("int32", "int64", True), ("int32", "uint32", True),
        ("int32", "bool", True),              # varint group
        ("sint32", "sint64", True),           # zigzag group
        ("sint32", "int32", False),           # zigzag vs plain varint
        # float/double are NOT wire-compatible with (s)fixed despite the
        # shared wire type — the bit patterns reinterpret (checker.go's
        # compatibleGroups exclude them; BDD protobuf_diff parity)
        ("fixed32", "sfixed32", True), ("fixed32", "float", False),
        ("fixed64", "double", False), ("fixed32", "fixed64", False),
        ("float", "float", True), ("double", "double", True),
        ("string", "bytes", True), ("bytes", "string", True),
        ("string", "int32", False), ("int32", "double", False),
    ])
    def test_wire_groups(self, wt, rt, ok):
        w = proto(f"  {wt} v = 1;")
        r = proto(f"  {rt} v = 1;")
        assert (check_pair(r, w, "PROTOBUF") == []) is ok

    def test_map_fields(self):
        w = proto("  map<string, int32> attrs = 1;")
        r_same = proto("  map<string, int32> attrs = 1;")
        r_scalar = proto("  int32 attrs = 1;")
        assert check_pair(r_same, w, "PROTOBUF") == []
        assert check_pair(r_scalar, w, "PROTOBUF") != []  # lendelim→varint

    def test_repeated_message_exception(self):
        w = proto("  message Inner { int32 a = 1; }\n  Inner v = 1;")
        r = proto("  message Inner { int32 a = 1; }\n  repeated Inner v = 1;")
        assert check_pair(r, w, "PROTOBUF") == []  # message packing exception

    def test_repeated_scalar_cardinality(self):
        w = proto("  int32 v = 1;")
        r = proto("  repeated int32 v = 1;")
        assert check_pair(r, w, "PROTOBUF") != []

    def test_enum_value_add_and_removal_both_compatible(self):
        # enums are open varints: unknown numbers are preserved, so value
        # removal AND addition are wire-compatible (checker.go:571-574;
        # BDD 'remove enum value is compatible' / 'add enum value')
        w = proto("  enum E { E_A = 0; E_B = 1; }\n  E v = 1;")
        r = proto("  enum E { E_A = 0; }\n  E v = 1;")
        assert check_pair(r, w, "PROTOBUF") == []
        assert check_pair(w, r, "PROTOBUF") == []

    def test_enum_type_rename_flagged(self):
        w = proto("  enum E { E_A = 0; }\n  E v = 1;")
        r = proto("  enum F { E_A = 0; }\n  F v = 1;")
        assert check_pair(r, w, "PROTOBUF") != []

    def test_oneof_membership_rules(self):
        # one field into a oneof whose other members are NEW → compatible
        # (wire format unchanged; BDD protobuf_diff 18/22)
        w = proto("  string v = 1;")
        r = proto("  oneof sel { string v = 1; int32 n = 2; }")
        assert check_pair(r, w, "PROTOBUF") == []
        # two previously-independent fields into one oneof → mutual
        # exclusion constraint added → incompatible (BDD 19)
        w2 = proto("  string v = 1;\n  string u = 2;")
        r2 = proto("  oneof sel { string v = 1; string u = 2; }")
        assert check_pair(r2, w2, "PROTOBUF") != []
        # into a oneof with PRE-EXISTING members → incompatible (BDD 23)
        w3 = proto("  string v = 1;\n  oneof sel { string u = 2; }")
        r3 = proto("  oneof sel { string v = 1; string u = 2; }")
        assert check_pair(r3, w3, "PROTOBUF") != []
        # removing a oneof member → incompatible (BDD 21)
        w4 = proto("  oneof sel { string v = 1; string u = 2; }")
        r4 = proto("  oneof sel { string v = 1; }")
        assert check_pair(r4, w4, "PROTOBUF") != []
        # moving OUT of a oneof → incompatible (checker.go:328-331)
        w5 = proto("  oneof sel { string v = 1; }")
        r5 = proto("  string v = 1;")
        assert check_pair(r5, w5, "PROTOBUF") != []

    def test_package_change_flagged(self):
        w = 'syntax = "proto3";\npackage foo;\nmessage M { string v = 1; }'
        r = 'syntax = "proto3";\npackage bar;\nmessage M { string v = 1; }'
        assert check_pair(r, w, "PROTOBUF") != []

    def test_nested_message_removal_flagged(self):
        w = proto("  message Inner { int32 a = 1; }\n  string v = 1;")
        r = proto("  string v = 1;")
        assert check_pair(r, w, "PROTOBUF") != []

    def test_mode_orchestration_protobuf(self):
        v1 = proto("  string id = 1;")
        v2 = proto("  string id = 1;\n  int32 n = 2;")
        ok, _ = check_compatibility(v2, [v1], "FULL_TRANSITIVE", "PROTOBUF")
        assert ok


class TestParserEdgeCases:
    def test_avro_recursive_record_self_compatible(self):
        ll = ('{"type":"record","name":"Node","fields":'
              '[{"name":"value","type":"int"},'
              '{"name":"next","type":["null","Node"],"default":null}]}')
        assert check_pair(ll, ll, "AVRO") == []

    def test_avro_recursive_record_field_change_detected(self):
        v1 = ('{"type":"record","name":"Node","fields":'
              '[{"name":"value","type":"int"},'
              '{"name":"next","type":["null","Node"],"default":null}]}')
        v2 = ('{"type":"record","name":"Node","fields":'
              '[{"name":"value","type":"string"},'
              '{"name":"next","type":["null","Node"],"default":null}]}')
        assert check_pair(v2, v1, "AVRO") != []

    def test_avro_short_name_reference_in_namespace(self):
        ns = ('{"type":"record","name":"Outer","namespace":"com.x","fields":['
              '{"name":"a","type":{"type":"record","name":"Inner","fields":'
              '[{"name":"v","type":"int"}]}},{"name":"b","type":"Inner"}]}')
        assert check_pair(ns, ns, "AVRO") == []

    def test_proto_package_options_imports_parse(self):
        from axonops_schema_registry_spark.registry.protobuf_parse import (
            parse_proto,
        )

        text = ('syntax = "proto3";\npackage com.example.events;\n'
                'import "other.proto";\noption java_package = "x";\n'
                'message A {\n  int32 x = 1 [deprecated = true];\n'
                '  B b = 2;\n}\nmessage B {\n  string y = 1;\n'
                '  enum Kind { option allow_alias = true; K_U = 0; }\n'
                '  Kind kind = 2;\n}\n')
        pf = parse_proto(text)
        assert pf.package == "com.example.events"
        assert sorted(pf.messages) == ["A", "B"]
        assert pf.messages["B"].enums["Kind"] == {"K_U": 0}
        assert check_pair(text, text, "PROTOBUF") == []

    def test_json_boolean_schemas(self):
        assert check_pair('{"type":"string"}', "true", "JSON") != []
        assert check_pair("true", '{"type":"string"}', "JSON") == []
        assert check_pair("false", '{"type":"string"}', "JSON") != []


class TestNameMatching:
    def test_record_rename_without_alias_fails(self):
        w = '{"type":"record","name":"Old","fields":[{"name":"v","type":"int"}]}'
        r = '{"type":"record","name":"New","fields":[{"name":"v","type":"int"}]}'
        issues = check_pair(r, w, "AVRO")
        assert issues and "name mismatch" in issues[0]

    def test_record_rename_with_alias_ok(self):
        w = '{"type":"record","name":"Old","fields":[{"name":"v","type":"int"}]}'
        r = ('{"type":"record","name":"New","aliases":["Old"],"fields":'
             '[{"name":"v","type":"int"}]}')
        assert check_pair(r, w, "AVRO") == []

    def test_namespace_change_same_shortname_ok(self):
        w = ('{"type":"record","name":"U","namespace":"com.a","fields":'
             '[{"name":"v","type":"int"}]}')
        r = ('{"type":"record","name":"U","namespace":"com.b","fields":'
             '[{"name":"v","type":"int"}]}')
        assert check_pair(r, w, "AVRO") == []

    def test_union_of_records_resolves_by_name(self):
        a = '{"type":"record","name":"A","fields":[{"name":"x","type":"int"}]}'
        b = '{"type":"record","name":"B","fields":[{"name":"x","type":"string"}]}'
        w = f'{{"type":"record","name":"R","fields":[{{"name":"u","type":[{a},{b}]}}]}}'
        # reader union has B's int-x variant removed: writer branch A ok,
        # writer branch B (string x) must fail against reader's A-only union
        r = f'{{"type":"record","name":"R","fields":[{{"name":"u","type":[{a}]}}]}}'
        issues = check_pair(r, w, "AVRO")
        assert issues  # branch B unreadable
        assert check_pair(f'{{"type":"record","name":"R","fields":[{{"name":"u","type":[{a},{b}]}}]}}', w, "AVRO") == []

    def test_json_not_restriction(self):
        w = '{"type":"string"}'
        r = '{"type":"string","not":{"enum":["forbidden"]}}'
        assert check_pair(r, w, "JSON") != []
        assert check_pair(w, r, "JSON") == []
