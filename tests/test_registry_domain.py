"""Unit tests for the registry domain library (pure Python, no Spark).

Cases follow FIXTURES.md §3 (the reference's BDD corpus patterns) plus the
Avro/JSON-Schema/Protobuf spec rules in SURVEY.md §2.9.
"""

from __future__ import annotations

import json

from axonops_schema_registry_spark.registry.avro import (
    avro_canonical_form,
    avro_extract_fields,
    avro_fingerprint,
)
from axonops_schema_registry_spark.registry.compat import (
    check_compatibility,
    check_pair,
)
from axonops_schema_registry_spark.registry.fields import (
    extract_fields,
    jsonschema_extract_fields,
    protobuf_extract_fields,
)
from axonops_schema_registry_spark.registry.protobuf_parse import parse_proto

USER_V1 = '{"type":"record","name":"User","fields":[{"name":"name","type":"string"}]}'
USER_V2 = ('{"type":"record","name":"User","fields":[{"name":"name","type":"string"},'
           '{"name":"age","type":"int","default":0}]}')
USER_V2_BAD = ('{"type":"record","name":"User","fields":[{"name":"name","type":"string"},'
               '{"name":"age","type":"int"}]}')


class TestAvroCanonical:
    def test_primitive_object_form_kept(self):
        # reference parity (parser.go:230): primitive object forms are
        # NOT collapsed — extra attributes like logicalType survive
        assert avro_canonical_form('{"type":"string"}') == \
            '{"type":"string"}'
        assert avro_canonical_form('"string"') == '"string"'
        assert avro_canonical_form(
            '{"type":"int","logicalType":"date"}') == \
            '{"logicalType":"date","type":"int"}'

    def test_strips_doc_keeps_default_orders_keys(self):
        # field defaults are KEPT (modeling_avro_conformance.feature:
        # default differences produce different fingerprints)
        messy = ('{"fields":[{"doc":"d","default":"x","name":"name",'
                 '"type":{"type":"string"}}],"type":"record","doc":"top",'
                 '"name":"User"}')
        assert avro_canonical_form(messy) == (
            '{"name":"User","type":"record","fields":'
            '[{"name":"name","type":{"type":"string"},"default":"x"}]}')

    def test_default_changes_fingerprint(self):
        a = ('{"type":"record","name":"D","fields":'
             '[{"name":"s","type":"string","default":""}]}')
        b = ('{"type":"record","name":"D","fields":'
             '[{"name":"s","type":"string","default":"hello"}]}')
        assert avro_fingerprint(a) != avro_fingerprint(b)

    def test_namespace_qualification(self):
        s = ('{"type":"record","name":"Order","namespace":"com.example",'
             '"fields":[{"name":"id","type":"long"}]}')
        canon = json.loads(avro_canonical_form(s))
        assert canon["name"] == "com.example.Order"

    def test_fingerprint_ignores_formatting(self):
        spaced = ('{ "type": "record", "name": "User", "fields": '
                  '[ { "name": "name", "type": "string" } ] }')
        assert avro_fingerprint(spaced) == avro_fingerprint(USER_V1)
        assert avro_fingerprint(USER_V1) != avro_fingerprint(USER_V2)


class TestAvroFields:
    def test_nested_paths(self):
        order = ('{"type":"record","name":"Order","namespace":"com.example","fields":['
                 '{"name":"order_id","type":"long","doc":"primary key"},'
                 '{"name":"customerId","type":["null","long"],"default":null},'
                 '{"name":"items","type":{"type":"array","items":{"type":"record",'
                 '"name":"Item","fields":[{"name":"sku","type":"string"},'
                 '{"name":"qty","type":"int","default":1}]}}},'
                 '{"name":"attrs","type":{"type":"map","values":"string"}}]}')
        fields = avro_extract_fields(order)
        by_path = {f["path"]: f for f in fields}
        assert by_path["order_id"]["type"] == "long"
        assert by_path["order_id"]["doc"] == "primary key"
        assert by_path["customerId"]["type"] == "union[null,long]"
        assert not by_path["customerId"]["required"]
        assert by_path["customerId"]["has_default"]
        assert by_path["items[].sku"]["type"] == "string"
        assert by_path["items[].qty"]["has_default"]
        assert by_path["attrs"]["type"] == "map"


class TestAvroCompat:
    def test_backward_add_with_default_ok(self):
        assert check_pair(USER_V2, USER_V1, "AVRO") == []

    def test_backward_add_without_default_fails(self):
        issues = check_pair(USER_V2_BAD, USER_V1, "AVRO")
        assert issues and "no default" in issues[0]

    def test_forward_direction(self):
        # FORWARD: old reads new — v1 reading v2 data ignores 'age' → ok
        ok, _ = check_compatibility(USER_V2_BAD, [USER_V1], "FORWARD")
        assert ok
        ok, msgs = check_compatibility(USER_V2_BAD, [USER_V1], "FULL")
        assert not ok and any("backward" in m for m in msgs)

    def test_numeric_promotion(self):
        i = '{"type":"record","name":"R","fields":[{"name":"v","type":"int"}]}'
        l = '{"type":"record","name":"R","fields":[{"name":"v","type":"long"}]}'
        assert check_pair(l, i) == []          # int → long promotes
        assert check_pair(i, l) != []          # long → int does not

    def test_string_bytes_interchange(self):
        s = '{"type":"record","name":"R","fields":[{"name":"v","type":"string"}]}'
        b = '{"type":"record","name":"R","fields":[{"name":"v","type":"bytes"}]}'
        assert check_pair(s, b) == [] and check_pair(b, s) == []

    def test_union_widening(self):
        u = ('{"type":"record","name":"R","fields":'
             '[{"name":"v","type":["null","string"],"default":null}]}')
        s = '{"type":"record","name":"R","fields":[{"name":"v","type":"string"}]}'
        assert check_pair(u, s) == []          # string fits the union
        assert check_pair(s, u) != []          # null branch unreadable

    def test_enum_symbol_subset(self):
        e1 = ('{"type":"record","name":"R","fields":[{"name":"e","type":'
              '{"type":"enum","name":"E","symbols":["A","B"]}}]}')
        e2 = ('{"type":"record","name":"R","fields":[{"name":"e","type":'
              '{"type":"enum","name":"E","symbols":["A"]}}]}')
        assert check_pair(e1, e2) == []        # reader superset ok
        assert check_pair(e2, e1) != []        # writer has extra symbol

    def test_fixed_size(self):
        f8 = ('{"type":"record","name":"R","fields":[{"name":"f","type":'
              '{"type":"fixed","name":"F","size":8}}]}')
        f16 = ('{"type":"record","name":"R","fields":[{"name":"f","type":'
               '{"type":"fixed","name":"F","size":16}}]}')
        assert check_pair(f8, f8) == []
        assert check_pair(f16, f8) != []

    def test_field_alias_resolution(self):
        renamed = ('{"type":"record","name":"User","fields":[{"name":"full_name",'
                   '"aliases":["name"],"type":"string"}]}')
        assert check_pair(renamed, USER_V1) == []

    def test_transitive_scope(self):
        ok, _ = check_compatibility(USER_V2, [USER_V1, USER_V2], "BACKWARD")
        assert ok
        v3_drops = ('{"type":"record","name":"User","fields":'
                    '[{"name":"age","type":"int"}]}')
        ok_latest, _ = check_compatibility(
            v3_drops, [USER_V1, USER_V2_BAD], "BACKWARD")
        ok_trans, _ = check_compatibility(
            v3_drops, [USER_V1, USER_V2_BAD], "BACKWARD_TRANSITIVE")
        assert ok_latest and not ok_trans  # v1 lacks 'age'

    def test_none_short_circuit(self):
        ok, _ = check_compatibility(USER_V2_BAD, [USER_V1], "NONE")
        assert ok


JS_V1 = '{"type":"object","properties":{"name":{"type":"string"}},"required":["name"]}'
JS_V2 = ('{"type":"object","properties":{"name":{"type":"string"},'
         '"email":{"type":"string"}},"required":["name"]}')


class TestJsonSchemaCompat:
    def test_add_optional_property_content_model(self):
        # open writer model → typed add is incompatible (reference BDD
        # 'add optional property to open content model'); closed writer
        # model → compatible (it could never emit the name)
        issues = check_pair(JS_V2, JS_V1, "JSON")
        assert issues and "open content model" in issues[0]
        closed_v1 = JS_V1[:-1] + ',"additionalProperties":false}'
        closed_v2 = JS_V2[:-1] + ',"additionalProperties":false}'
        assert check_pair(closed_v2, closed_v1, "JSON") == []

    def test_new_required_property_fails(self):
        v2_req = ('{"type":"object","properties":{"name":{"type":"string"},'
                  '"email":{"type":"string"}},"required":["name","email"]}')
        issues = check_pair(v2_req, JS_V1, "JSON")
        assert issues and "newly required" in issues[0]

    def test_integer_to_number_widening(self):
        i = '{"type":"object","properties":{"v":{"type":"integer"}}}'
        n = '{"type":"object","properties":{"v":{"type":"number"}}}'
        assert check_pair(n, i, "JSON") == []
        assert check_pair(i, n, "JSON") != []

    def test_closing_content_model_fails(self):
        closed = ('{"type":"object","properties":{"name":{"type":"string"}},'
                  '"required":["name"],"additionalProperties":false}')
        assert check_pair(closed, JS_V1, "JSON") != []
        assert check_pair(JS_V1, closed, "JSON") == []

    def test_constraint_narrowing(self):
        loose = '{"type":"object","properties":{"v":{"type":"string"}}}'
        tight = ('{"type":"object","properties":{"v":{"type":"string",'
                 '"maxLength":10}}}')
        assert check_pair(loose, tight, "JSON") == []
        assert check_pair(tight, loose, "JSON") != []

    def test_enum_containment(self):
        small = '{"enum":["a"]}'
        big = '{"enum":["a","b"]}'
        assert check_pair(big, small, "JSON") == []
        assert check_pair(small, big, "JSON") != []

    def test_ref_resolution(self):
        reader = ('{"type":"object","properties":{"v":{"$ref":"#/$defs/s"}},'
                  '"$defs":{"s":{"type":"string"}}}')
        writer = '{"type":"object","properties":{"v":{"type":"string"}}}'
        assert check_pair(reader, writer, "JSON") == []

    def test_dependent_required(self):
        r = ('{"type":"object","properties":{"a":{},"b":{}},'
             '"dependentRequired":{"a":["b"]}}')
        w = '{"type":"object","properties":{"a":{},"b":{}}}'
        assert check_pair(r, w, "JSON") != []
        assert check_pair(w, r, "JSON") == []


PROTO_V1 = 'syntax = "proto3";\nmessage Event {\n  string id = 1;\n}\n'
PROTO_V2 = ('syntax = "proto3";\nmessage Event {\n  string id = 1;\n'
            '  string source = 2;\n}\n')


class TestProtobuf:
    def test_parse(self):
        pf = parse_proto(PROTO_V2)
        assert pf.syntax == "proto3"
        assert pf.messages["Event"].fields[1].name == "id"
        assert pf.messages["Event"].fields[2].type == "string"

    def test_add_field_ok_both_ways(self):
        assert check_pair(PROTO_V2, PROTO_V1, "PROTOBUF") == []
        assert check_pair(PROTO_V1, PROTO_V2, "PROTOBUF") == []

    def test_wire_group_change_fails(self):
        v_int = 'syntax = "proto3";\nmessage E {\n  int32 v = 1;\n}\n'
        v_str = 'syntax = "proto3";\nmessage E {\n  string v = 1;\n}\n'
        v_long = 'syntax = "proto3";\nmessage E {\n  int64 v = 1;\n}\n'
        assert check_pair(v_str, v_int, "PROTOBUF") != []
        assert check_pair(v_long, v_int, "PROTOBUF") == []  # same varint group

    def test_rename_by_number_ok(self):
        renamed = 'syntax = "proto3";\nmessage Event {\n  string ident = 1;\n}\n'
        assert check_pair(renamed, PROTO_V1, "PROTOBUF") == []

    def test_required_removal_proto2(self):
        p2 = 'syntax = "proto2";\nmessage E {\n  required string v = 1;\n}\n'
        p2_without = 'syntax = "proto2";\nmessage E {\n  optional string w = 2;\n}\n'
        assert check_pair(p2_without, p2, "PROTOBUF") != []

    def test_oneof_and_nested(self):
        nested = ('syntax = "proto3";\nmessage Outer {\n'
                  '  message Inner { int32 a = 1; }\n'
                  '  Inner inner = 1;\n'
                  '  oneof sel { string s = 2; int32 n = 3; }\n}\n')
        pf = parse_proto(nested)
        assert pf.messages["Outer"].fields[2].oneof == "sel"
        assert pf.messages["Outer"].messages["Inner"].fields[1].name == "a"
        assert check_pair(nested, nested, "PROTOBUF") == []

    def test_fields_extraction(self):
        fields = protobuf_extract_fields(PROTO_V2)
        assert {f["path"] for f in fields} == {"id", "source"}


ADDRESS_V1 = ('{"type":"record","name":"Address","namespace":"com.example",'
              '"fields":[{"name":"street","type":"string"}]}')
ADDRESS_V2 = ('{"type":"record","name":"Address","namespace":"com.example",'
              '"fields":[{"name":"street","type":"string"},'
              '{"name":"city","type":"string","default":""}]}')
ADDRESS_V2_BAD = ('{"type":"record","name":"Address","namespace":"com.example",'
                  '"fields":[{"name":"street","type":"string"},'
                  '{"name":"city","type":"string"}]}')
USER_WITH_REF = ('{"type":"record","name":"User","fields":'
                 '[{"name":"name","type":"string"},'
                 '{"name":"addr","type":"com.example.Address"}]}')


class TestCrossSubjectRefs:
    """Reference resolution before compat (registry.go:336-351): named
    types defined in OTHER subjects resolve via the refs lists."""

    def test_ref_evolution_compatible(self):
        issues = check_pair(USER_WITH_REF, USER_WITH_REF, "AVRO",
                            reader_refs=(ADDRESS_V2,),
                            writer_refs=(ADDRESS_V1,))
        assert issues == []  # city has a default → readable

    def test_ref_evolution_incompatible(self):
        issues = check_pair(USER_WITH_REF, USER_WITH_REF, "AVRO",
                            reader_refs=(ADDRESS_V2_BAD,),
                            writer_refs=(ADDRESS_V1,))
        assert issues and "city" in issues[0]

    def test_proto_fingerprint_formatting_invariant(self):
        from axonops_schema_registry_spark.registry.spark_udfs import (
            canonical_fingerprint,
        )

        a = 'syntax = "proto3";\nmessage E {\n  string id = 1;\n}\n'
        b = ('syntax   =   "proto3";  // header comment\n'
             'message E { string id = 1; /* inline */ }')
        c = 'syntax = "proto3";\nmessage E {\n  string id = 2;\n}\n'
        assert canonical_fingerprint(a, "PROTOBUF") == \
            canonical_fingerprint(b, "PROTOBUF")
        assert canonical_fingerprint(a, "PROTOBUF") != \
            canonical_fingerprint(c, "PROTOBUF")


class TestFieldDispatch:
    def test_jsonschema_fields(self):
        fields = jsonschema_extract_fields(JS_V2)
        by = {f["name"]: f for f in fields}
        assert by["name"]["required"] and not by["email"]["required"]

    def test_dispatch(self):
        assert extract_fields(USER_V1, "AVRO")[0]["name"] == "name"
        assert extract_fields(JS_V1, "JSON")[0]["name"] == "name"
        assert extract_fields(PROTO_V1, "PROTOBUF")[0]["name"] == "id"
        assert extract_fields("not json", "AVRO") == []


class TestJsonCrossSubjectRefs:
    def test_external_ref_resolution(self):
        user = ('{"type":"object","properties":'
                '{"addr":{"$ref":"address.json"}},"required":["addr"]}')
        # closed content models: the property add in v2 is then judged
        # against additionalProperties:false and stays compatible under
        # reference content-model semantics (an OPEN-model add would be
        # incompatible and mask what this test exercises: resolution)
        addr_v1 = ('{"type":"object","properties":{"street":{"type":"string"}},'
                   '"additionalProperties":false}')
        addr_v2 = ('{"type":"object","properties":{"street":{"type":"string"},'
                   '"city":{"type":"string"}},"additionalProperties":false}')
        addr_narrow = ('{"type":"object","properties":'
                       '{"street":{"type":"string","maxLength":3}}}')
        ok = check_pair(user, user, "JSON",
                        reader_refs={"address.json": addr_v2},
                        writer_refs={"address.json": addr_v1})
        assert ok == []
        bad = check_pair(user, user, "JSON",
                         reader_refs={"address.json": addr_narrow},
                         writer_refs={"address.json": addr_v1})
        assert bad and "maxLength" in bad[0]

    def test_prefix_items_draft2020(self):
        w = ('{"type":"array","prefixItems":'
             '[{"type":"string"},{"type":"integer"}]}')
        r_ok = ('{"type":"array","prefixItems":'
                '[{"type":"string"},{"type":"number"}]}')
        r_short_closed = ('{"type":"array","prefixItems":'
                          '[{"type":"string"}],"items":false}')
        assert check_pair(r_ok, w, "JSON") == []
        assert check_pair(r_short_closed, w, "JSON") != []


class TestStructuralValidation:
    """Parse-time 422 rules (modeling_negative_validation.feature parity):
    the reference's parser rejects these before any compat logic runs."""

    def _avro_invalid(self, text):
        import pytest as _pytest

        from axonops_schema_registry_spark.registry.avro import avro_validate
        with _pytest.raises(ValueError):
            avro_validate(text)

    def test_unknown_primitive_rejected(self):
        self._avro_invalid('{"type":"record","name":"R","fields":'
                           '[{"name":"f","type":"str"}]}')

    def test_unknown_named_reference_rejected(self):
        self._avro_invalid('{"type":"record","name":"R","fields":'
                           '[{"name":"f","type":"com.x.Nope"}]}')

    def test_duplicate_field_names_rejected(self):
        self._avro_invalid('{"type":"record","name":"R","fields":'
                           '[{"name":"x","type":"int"},'
                           '{"name":"x","type":"string"}]}')

    def test_bad_default_rejected(self):
        self._avro_invalid('{"type":"record","name":"R","fields":'
                           '[{"name":"n","type":"int","default":"nope"}]}')

    def test_union_default_checks_first_branch(self):
        from axonops_schema_registry_spark.registry.avro import avro_validate
        avro_validate('{"type":"record","name":"R","fields":'
                      '[{"name":"n","type":["null","int"],'
                      '"default":null}]}')
        self._avro_invalid('{"type":"record","name":"R","fields":'
                           '[{"name":"n","type":["null","int"],'
                           '"default":5}]}')

    def test_empty_enum_and_zero_fixed_rejected(self):
        self._avro_invalid('{"type":"enum","name":"E","symbols":[]}')
        self._avro_invalid('{"type":"fixed","name":"F","size":0}')

    def test_valid_schemas_pass(self):
        from axonops_schema_registry_spark.registry.avro import avro_validate
        avro_validate(USER_V2)
        avro_validate('{"type":"record","name":"Node","fields":'
                      '[{"name":"next","type":["null","Node"],'
                      '"default":null}]}')  # recursive self-reference
        avro_validate('{"type":"enum","name":"E","symbols":["A"]}')

    def test_proto_duplicate_number_rejected(self):
        import pytest as _pytest

        from axonops_schema_registry_spark.registry.protobuf_parse import (
            parse_proto,
            proto_validate,
        )

        pf = parse_proto('syntax = "proto3";\nmessage M {\n'
                         '  string a = 1;\n  int32 b = 1;\n}')
        with _pytest.raises(ValueError):
            proto_validate(pf)

    def test_proto_import_rules(self):
        import pytest as _pytest

        from axonops_schema_registry_spark.registry.protobuf_parse import (
            parse_proto,
            proto_validate,
        )

        wk = parse_proto('syntax = "proto3";\n'
                         'import "google/protobuf/timestamp.proto";\n'
                         'message M { string a = 1; }')
        proto_validate(wk)  # well-known imports need no reference
        ext = parse_proto('syntax = "proto3";\nimport "other.proto";\n'
                          'message M { string a = 1; }')
        with _pytest.raises(ValueError):
            proto_validate(ext)
        proto_validate(ext, known_imports=("other.proto",))
