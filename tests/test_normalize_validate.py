"""Normalizer-spec builders (reference ``tests/test_create_defaults.py``
behaviors) and compiled-closure validator (reference
``tests/test_validator.py`` behaviors, V3 strictness rules)."""

import pytest

from ts_type_filter_ray.typefilter import (Define, Literal, Struct, Type,
                                           Union, parse)
from ts_type_filter_ray.typefilter.normalize import (create_normalizer,
                                                     create_normalizer_spec,
                                                     expand_generic_type,
                                                     merge_normalizer_specs,
                                                     normalize1, normalize2)
from ts_type_filter_ray.typefilter.validator import create_validator
from ts_type_filter_ray.typefilter.validator_pydantic import \
    create_validator_v1

# -- normalizer specs ---------------------------------------------------


def test_spec_basic():
    defs = [
        Define("Foo", [], Struct({
            "name": Union(Literal("a"), Literal("b")),
            "field1?": Literal(1),
            "field2?": Literal(3)})),
        Define("Bar", [], Struct({
            "name": Literal("c"),
            "field3": Literal("hello"),
            "field4?": Literal(123)})),
    ]
    spec = create_normalizer_spec(defs)
    assert spec["types"] == {"a": "Foo", "b": "Foo", "c": "Bar"}
    assert spec["defaults"] == {"Foo": {"field1": None, "field2": None},
                                "Bar": {"field4": None}}
    assert spec["duplicates"] == {}


def test_spec_type_references_and_chains():
    defs = [
        Define("MainStruct", [], Struct({
            "name": Type("NameAlias"),
            "required_field": Literal("required"),
            "optional_field?": Literal("optional")})),
        Define("NameAlias", [], Type("ActualNames")),
        Define("ActualNames", [], Union(Literal("deep1"), Literal("deep2"))),
    ]
    spec = create_normalizer_spec(defs)
    assert spec["types"] == {"deep1": "MainStruct", "deep2": "MainStruct"}
    assert spec["defaults"] == {"MainStruct": {"optional_field": None}}


def test_spec_duplicates_detected():
    defs = [
        Define("A", [], Struct({"name": Literal("x"), "o?": Literal(1)})),
        Define("B", [], Struct({"name": Literal("x"), "p?": Literal(2)})),
    ]
    spec = create_normalizer_spec(defs)
    assert spec["duplicates"] == {"x": ["A", "B"]}


def test_spec_generic_expansion():
    # GROUP = OPTION<"a"|"b"> monomorphizes into a concrete struct
    defs = parse('''
        type Group=Option<"a"|"b">;
        type Option<NAME>={name:NAME,amount?:"Regular"};
    ''')
    spec = create_normalizer_spec(defs)
    assert spec["types"]["a"] == "Group"
    assert spec["types"]["b"] == "Group"
    assert spec["defaults"]["Group"] == {"amount": None}


def test_expand_generic_type_direct():
    defs = parse('type Opt<T>={name:T,extra?:"x"};type G=Opt<"ham">;')
    g = next(d for d in defs if d.name == "G")
    expanded = expand_generic_type(g.type, defs)
    assert isinstance(expanded, Struct)
    assert expanded.obj["name"].text == "ham"


def test_normalize1_merges_defaults_tree_wins():
    defaults = {"burger": {"cheese": "No", "bacon": "No"}}
    tree = {"items": [{"name": "burger", "cheese": "Extra"}]}
    out = normalize1(tree, defaults)
    assert out == {"items": [{"name": "burger", "cheese": "Extra",
                              "bacon": "No"}]}
    # input untouched (deep copy)
    assert tree == {"items": [{"name": "burger", "cheese": "Extra"}]}


def test_normalize2_removes_defaults():
    defaults = {"burger": {"cheese": "No", "bacon": "No"}}
    tree = {"items": [{"name": "burger", "cheese": "No", "bacon": "Extra"}]}
    out = normalize2(tree, defaults)
    assert out == {"items": [{"name": "burger", "bacon": "Extra"}]}


def test_create_normalizer_round_trip():
    defs = [Define("Foo", [], Struct({
        "name": Literal("a"), "opt?": Literal("x")}))]
    spec = create_normalizer_spec(defs)
    add = create_normalizer(spec, remove_defaults=False)
    strip = create_normalizer(spec, remove_defaults=True)
    assert add({"name": "a"}) == {"name": "a", "opt": None}
    assert strip({"name": "a", "opt": None}) == {"name": "a"}


def test_merge_specs_renames_and_warnings():
    original = {"types": {"a": "Old"}, "defaults": {"Old": {"f": None}},
                "duplicates": {}}
    new = {"types": {"a": "New"}, "defaults": {"New": {"g": None}},
           "duplicates": {}}
    merged, warnings = merge_normalizer_specs(new, original, {"Old": "New"})
    assert merged["defaults"]["New"] == {"f": None, "g": None}
    assert merged["types"] == {"a": "New"}
    # stale warning path
    merged2, warnings2 = merge_normalizer_specs(
        {"types": {}, "defaults": {}, "duplicates": {}}, original, {})
    assert any("not found in new spec" in w for w in warnings2)


# -- validator ----------------------------------------------------------


def V(src: str, root: str):
    return create_validator(parse(src), root)


@pytest.mark.parametrize("src,root,value,expected", [
    ('type A="x";', "A", "x", True),
    ('type A="x";', "A", "y", False),
    ("type A=1;", "A", 1, True),
    ("type A=1;", "A", 2, False),
    ("type A=1;", "A", True, False),          # strict: bool is not 1
    ("type A=true;", "A", True, True),
    ("type A=true;", "A", 1, False),          # strict: 1 is not true
    ("type A=string;", "A", "anything", True),
    ("type A=string;", "A", 3, False),
    ("type A=number;", "A", 3, True),
    ("type A=number;", "A", 3.5, True),
    ("type A=number;", "A", True, False),     # number excludes bool
    ("type A=boolean;", "A", False, True),
    ("type A=boolean;", "A", 0, False),
    ("type A=any;", "A", {"x": 1}, True),
    ("type A=never;", "A", "anything", False),
    ('type A="x"|"y";', "A", "y", True),
    ('type A="x"|"y";', "A", "z", False),
    ('type A="x"[];', "A", ["x", "x"], True),
    ('type A="x"[];', "A", ["x", "y"], False),
    ('type A="x"[];', "A", "x", False),
    ('type A={f:"x"};', "A", {"f": "x"}, True),
    ('type A={f:"x"};', "A", {"f": "y"}, False),
    ('type A={f:"x"};', "A", {}, False),                  # required missing
    ('type A={f:"x"};', "A", {"f": "x", "g": 1}, False),  # extra forbidden
    ('type A={f?:"x"};', "A", {}, True),                  # optional missing ok
    ('type A={f?:"x"};', "A", {"f": "y"}, False),
    ('type A=B;type B="x";', "A", "x", True),
    ('type A=B<"x">;type B<T>={f:T};', "A", {"f": "x"}, True),
    ('type A=B<"x">;type B<T>={f:T};', "A", {"f": "y"}, False),
    ('type A=B<"x","y">;type B<S,T>={s:S,t:T};', "A",
     {"s": "x", "t": "y"}, True),
    ('type A=B<"x","y">;type B<S,T>={s:S,t:T};', "A",
     {"s": "y", "t": "x"}, False),            # positional binding
])
def test_validator_cases(src, root, value, expected):
    assert V(src, root)(value) is expected
    # V1 (dynamic Pydantic model) must agree on every V2 case
    assert create_validator_v1(parse(src), root)(value) is expected


def test_validator_root_errors():
    with pytest.raises(ValueError, match="not found"):
        V("type A=1;", "Missing")
    with pytest.raises(ValueError, match="not found"):
        create_validator_v1(parse("type A=1;"), "Missing")
    with pytest.raises(ValueError, match="parameters"):
        V("type A<T>={x:T};", "A")


def test_validator_menu_cart():
    src = '''
    type Cart={items:Item[]};
    type Item=Burger|Drink<"Cola"|"Tea">;
    type Burger={name:"burger",options?:Option[]};
    type Option={name:"cheese"|"bacon",amount:"No"|"Regular"|"Extra"};
    type Drink<NAME>={name:NAME,size:"S"|"L"};
    '''
    v = V(src, "Cart")
    assert v({"items": []})
    assert v({"items": [{"name": "burger"}]})
    assert v({"items": [{"name": "burger",
                         "options": [{"name": "cheese", "amount": "Extra"}]}]})
    assert v({"items": [{"name": "Cola", "size": "S"}]})
    assert not v({"items": [{"name": "Cola", "size": "XL"}]})
    assert not v({"items": [{"name": "burger", "extra": 1}]})
    assert not v({"items": [{"name": "pizza"}]})


def test_stages_over_ray(ray_session):
    import ray.data as rd

    from ts_type_filter_ray.typefilter.normalize import NormalizeCartsStage
    from ts_type_filter_ray.typefilter.validator import ValidateCartsStage

    src = 'type Cart={name:"a",opt?:"x"};'
    spec = create_normalizer_spec(parse(src))
    carts = rd.from_items([
        {"cart": '{"name": "a", "opt": null}'},
        {"cart": '{"name": "a", "opt": "x"}'},
        {"cart": '{"name": "b"}'},
    ])
    # key on row CONTENT, not position — block order is an executor
    # property, not an engine contract
    normed = carts.map_batches(NormalizeCartsStage,
                               fn_constructor_args=(spec,),
                               batch_format="pyarrow",
                               concurrency=1).take_all()
    by_cart = {r["cart"]: r["normalized"] for r in normed}
    assert by_cart['{"name": "a", "opt": null}'] == '{"name": "a"}'

    valid = carts.map_batches(ValidateCartsStage,
                              fn_constructor_args=(src, "Cart"),
                              batch_format="pyarrow",
                              concurrency=1).take_all()
    assert {r["cart"]: r["valid"] for r in valid} == {
        '{"name": "a", "opt": null}': False,
        '{"name": "a", "opt": "x"}': True,
        '{"name": "b"}': False,
    }


def test_validator_v1_menu_cart():
    """V1 (Pydantic) agrees with V2 on the nested menu-cart graph,
    including generics bound positionally through the symbol chain."""
    src = '''
    type Cart={items:Item[]};
    type Item=Burger|Drink<"Cola"|"Tea">;
    type Burger={name:"burger",options?:Option[]};
    type Option={name:"cheese"|"bacon",amount:"No"|"Regular"|"Extra"};
    type Drink<NAME>={name:NAME,size:"S"|"L"};
    '''
    v1 = create_validator_v1(parse(src), "Cart")
    assert v1({"items": []})
    assert v1({"items": [{"name": "burger"}]})
    assert v1({"items": [{"name": "burger",
                          "options": [{"name": "cheese",
                                       "amount": "Extra"}]}]})
    assert v1({"items": [{"name": "Cola", "size": "S"}]})
    assert not v1({"items": [{"name": "Cola", "size": "XL"}]})
    assert not v1({"items": [{"name": "burger", "extra": 1}]})
    assert not v1({"items": [{"name": "pizza"}]})


def test_validator_v1_generic_struct_instantiated_twice():
    """A generic struct instantiated more than once (Box<"x"> and
    Box<"y">) must build two distinct models, not raise a spurious
    'Recursive type detected' (ADVICE r2): only an IN-PROGRESS revisit of
    the same Struct node is recursion."""
    src = 'type A={x:Box<"x">,y:Box<"y">};type Box<T>={v:T};'
    v1 = create_validator_v1(parse(src), "A")
    assert v1({"x": {"v": "x"}, "y": {"v": "y"}})
    assert not v1({"x": {"v": "y"}, "y": {"v": "y"}})  # bindings distinct
    assert not v1({"x": {"v": "x"}, "y": {"v": "x"}})
    # V2 agrees
    v2 = V(src, "A")
    assert v2({"x": {"v": "x"}, "y": {"v": "y"}})
    assert not v2({"x": {"v": "y"}, "y": {"v": "y"}})
    # true recursion is still rejected
    with pytest.raises(ValueError, match="Recursive"):
        create_validator_v1(parse("type A={self:A};"), "A")


def test_validate_carts_stage_pydantic_mode(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from ts_type_filter_ray.typefilter.validator import ValidateCartsStage

    src = 'type Cart={name:"a",opt?:"x"};'
    tbl = pa.table({"cart": pa.array(
        ['{"name": "a"}', '{"name": "a", "opt": "x"}',
         '{"name": "b"}', '{"name": "a", "zzz": 1}'])})
    out = (rd.from_arrow(tbl)
           .map_batches(ValidateCartsStage,
                        fn_constructor_args=(src, "Cart", "pydantic"),
                        batch_format="pyarrow", concurrency=1)
           .take_all())
    assert [r["valid"] for r in out] == [True, True, False, False]
