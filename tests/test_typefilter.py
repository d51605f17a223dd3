"""Type-filter conformance: the 8 golden prune cases from the reference's
``tests/test_type_filter.py:30-159`` (graph and expected outputs mirrored
structurally), parser round-trips from ``tests/test_parser.py``, and the
hint/LITERAL/comment behaviors."""

import pytest

from ts_type_filter_ray.typefilter import (Array, Define, Literal, ParamDef,
                                           ParamRef, Struct, Type, Union,
                                           build_filtered_types,
                                           build_type_index,
                                           collect_string_literals, parse,
                                           prune_source, serialize_defs,
                                           strip_ts_comments)


def run_filter(defs, query):
    symbols, indexer = build_type_index(defs)
    reachable = build_filtered_types(defs, symbols, indexer, query)
    return {d.format() for d in reachable}


def expect(text):
    return {ln.strip() for ln in text.strip().split("\n") if ln.strip()}


def graph():
    # the reference's 14-type conformance graph (test_type_filter.py:30-58)
    return [
        Define("Cart", [], Struct({"items": Array(Type("Item"))})),
        Define("Item", [], Union(
            Type("J"), Type("P"),
            Type("Q", [ParamRef(Type("V"))]),
            Type("R", [ParamRef(Type("WXYZ"))]))),
        Define("P", [], Struct({"p1": Type("V"), "p2": Type("W"),
                                "p3": Type("X"), "p4": Type("Y")})),
        Define("Q", [ParamDef("T")], Struct({"q1": Type("T")})),
        Define("R", [ParamDef("T", Type("WXYZ"))], Struct({"r1": Type("T")})),
        Define("WXYZ", [], Union(Type("W"), Type("X"), Type("Y"), Type("Z"))),
        Define("V", [], Literal("v")),
        Define("W", [], Literal("w")),
        Define("X", [], Literal("x")),
        Define("Y", [], Literal("y")),
        Define("Z", [], Literal("z")),
        Define("J", [], Type("K")),
        Define("K", [], Type("L")),
        Define("L", [], Union(Literal("l"), Literal("m"))),
    ]


CASES = [
    ("", "type Cart=never;", "no search term"),
    ("bad", "type Cart=never;", "nonexistent term"),
    ("v w x y z", """
        type Cart={items:Item[]};
        type Item=P|Q<V>|R<WXYZ>;
        type P={p1:V,p2:W,p3:X,p4:Y};
        type Q<T>={q1:T};
        type R<T extends WXYZ>={r1:T};
        type WXYZ=W|X|Y|Z;
        type V="v";
        type W="w";
        type X="x";
        type Y="y";
        type Z="z";
     """, "all terms"),
    ("v", """
        type Cart={items:Item[]};
        type Item=Q<V>;
        type Q<T>={q1:T};
        type V="v";
     """, "union1"),
    ("v w", """
        type Cart={items:Item[]};
        type Item=Q<V>|R<WXYZ>;
        type Q<T>={q1:T};
        type R<T extends WXYZ>={r1:T};
        type WXYZ="w";
        type V="v";
     """, "union2"),
    ("w x y z", """
        type Cart={items:Item[]};
        type Item=R<WXYZ>;
        type R<T extends WXYZ>={r1:T};
        type WXYZ=W|X|Y|Z;
        type W="w";
        type X="x";
        type Y="y";
        type Z="z";
     """, "struct1"),
    ("x y", """
        type Cart={items:Item[]};
        type Item=R<WXYZ>;
        type R<T extends WXYZ>={r1:T};
        type WXYZ=X|Y;
        type X="x";
        type Y="y";
     """, "struct2"),
    ("l", """
        type Cart={items:Item[]};
        type Item="l";
     """, "path collapse 1"),
    ("l m", """
        type Cart={items:Item[]};
        type Item="l"|"m";
     """, "path collapse 2"),
]


@pytest.mark.parametrize("query,expected,name", CASES,
                         ids=[c[2] for c in CASES])
def test_golden_prune(query, expected, name):
    assert run_filter(graph(), query) == expect(expected)


ROUND_TRIPS = [
    'type A=never;',
    'type A=any;',
    'type A="hello";',
    "type A=1;",
    "type A=1.5;",
    "type A=true;",
    "type A=false;",
    "type A=string;",
    "type A=B;",
    "type A=B|C;",
    'type A="x"|"y"|"z";',
    "type A=B[];",
    "type A=(B|C)[];",
    "type A={a:B};",
    "type A={a:B,b:C};",
    "type A={a?:B};",
    "type A=B<C>;",
    "type A=B<C,D>;",
    "type A<T>={x:T};",
    "type A<T extends B>={x:T};",
    "type A={a:{b:C}};",
    'type Cart={items:Item[]};',
]


@pytest.mark.parametrize("src", ROUND_TRIPS)
def test_parse_format_round_trip(src):
    defs = parse(src)
    assert len(defs) == 1
    assert defs[0].format() == src


def test_parse_with_semicolons_and_whitespace():
    defs = parse("type A = B | C ;\n\ntype D = { x : E , y ?: F } ;")
    assert [d.format() for d in defs] == \
        ["type A=B|C;", "type D={x:E,y?:F};"]


def test_literalex():
    defs = parse('type A=LITERAL<"veggie",["vegetarian","veggie"],true>;')
    lit = defs[0].type
    assert lit.text == "veggie"
    assert lit.aliases == ["vegetarian", "veggie"]
    assert lit.pinned is True
    # formats as the plain literal text
    assert defs[0].format() == 'type A="veggie";'


def test_literalex_alias_search():
    # alias "vegetarian" matches via the index; Meat prunes away and the
    # singleton union path-compresses into Root (reference P5 semantics)
    src = ('type Root=Veg|Meat;'
           'type Veg=LITERAL<"veggie",["vegetarian"],false>;'
           'type Meat="meat";')
    out = prune_source(src, "vegetarian")
    assert out == 'type Root="veggie";'


def test_pinned_literal_survives_unrelated_query():
    src = ('type Root=Special|Meat;'
           'type Special=LITERAL<"daily special",[],true>;'
           'type Meat="meat";')
    out = prune_source(src, "meat")
    assert 'type Special="daily special";' in out
    assert 'type Meat="meat";' in out
    # empty query: only the pinned literal survives, path-compressed
    out2 = prune_source(src, "")
    assert out2 == 'type Root="daily special";'


def test_comments_and_hints():
    src = '''
    // plain comment disappears
    // Hint: use sparingly
    type A=B; /* block gone */
    type B="x";
    '''
    defs = parse(src)
    assert defs[0] == "// use sparingly"
    assert defs[1].format() == "type A=B;"


def test_strip_comments_protects_strings():
    src = 'type A="has // not a comment";'
    assert strip_ts_comments(src) == src
    assert parse(src)[0].type.text == "has // not a comment"


def test_single_quoted_strings():
    assert parse("type A='x';")[0].type.text == "x"


def test_collect_string_literals():
    cart = {"items": [{"name": "burger", "extras": ["cheese", "bacon"]},
                      {"name": "fries", "size": 2}]}
    got = sorted(collect_string_literals(cart))
    assert got == ["bacon", "burger", "cheese", "fries"]


def test_serialize_compress():
    defs = parse("type A = B ;\ntype B = \"x\" ;")
    assert serialize_defs(defs, compress=True) == 'type A=B; type B="x";'


def test_prune_source_end_to_end():
    src = '''
    type Cart={items:Item[]};
    type Item=Pizza|Burger;
    type Pizza={name:"pizza",size?:PizzaSize};
    type PizzaSize="small"|"large";
    type Burger={name:"burger"};
    '''
    # "pizza": Burger prunes; optional size (unmatched) drops; the
    # singleton union path-compresses Pizza's struct into Item
    out = prune_source(src, "pizza")
    assert '"pizza"' in out and '"burger"' not in out
    assert 'type Item={name:"pizza"};' in out
    out_all = prune_source(src, "pizza burger small large")
    assert "type Item=Pizza|Burger;" in out_all
    assert 'type PizzaSize="small"|"large";' in out_all


def test_optional_field_dropped_required_collapses():
    src = ('type Root=A|B;'
           'type A={keep:"x",extra?:Gone};'
           'type B={req:Gone2};'
           'type Gone="gone";'
           'type Gone2="gone2";')
    # B's required field prunes → B collapses; A's optional field drops;
    # the singleton union path-compresses A's struct into Root
    out = prune_source(src, "x")
    assert out == 'type Root={keep:"x"};'


# -- comprehensive menu round-trip (exercises every grammar feature the
#    reference's 43-type menu does: multi-param generics with extends,
#    CHOOSE sentinel, unicode literals, hints, optionals, parenthesized
#    union arrays; structure mirrors tests/test_parser.py:133-203) --

COMPREHENSIVE = """
type Cart={items:Item[]};
type Item=ComboMeal<Sizes>|Sandwich|Wrap|SideOrder<any,any>|Drink<any,any>;
type ComboMeal<SIZE extends Sizes>={name:"Combo Meal",size:SIZE,main:Sandwich|CHOOSE,side:SideOrder<"Curly Fries"|"Tots",SIZE>|CHOOSE,drink:Drink<any,any>|CHOOSE};
type Sandwich=GenericSandwich<"Classic Stack"|"Double Stack"|"Veggie Stack">;
type GenericSandwich<NAME>={name:NAME,style:"Plain"|"Toasted"|CHOOSE,options?:(Toppings|Sauces)[]};
type Wrap={name:"Garden Wrap"|"Spicy Wrap",options?:(Toppings|Sauces)[]};
type SideOrder<NAME extends "Curly Fries"|"Tots",SIZE extends SideSizes>={name:NAME,size:SIZE,dip:Dip|CHOOSE};
type SideSizes="Small"|"Large"|CHOOSE;
type Sizes="Small"|"Medium"|"Large"|CHOOSE;
type Drink<NAME extends DrinkNames,SIZE extends Sizes>={name:NAME,size:SIZE,options?:Ice[]};
type DrinkNames="Cola"|"Diet Cola"|"Lemon Fizz"|"Iced Tea";
type Ice={name:"Ice",amount:"Regular"|"Light"|"No"};
type Toppings={amount:Amount,name:"Lettuce"|"Tomato"|"Jalapeños"};
type Sauces={amount:Amount,name:"House Sauce"|"Fire Sauce"};
type Dip={name:"Ranch"|"Queso"|"None"};
type Amount="No"|"Regular"|"Extra";
// Hint: Use CHOOSE when customer doesn't specify an option
type CHOOSE="CHOOSE";
"""


def test_comprehensive_round_trip():
    defs = parse(COMPREHENSIVE)
    out = [d if isinstance(d, str) else d.format() for d in defs]
    expected = COMPREHENSIVE.strip().splitlines()
    for o, e in zip(out, expected):
        if e.startswith("// Hint:"):
            assert o == "//" + e[8:]
        else:
            assert o == e
    assert len(out) == len(expected)


def test_comprehensive_round_trip_no_semicolons():
    lines = [ln[:-1] if ln.endswith(";") else ln
             for ln in COMPREHENSIVE.strip().splitlines()]
    defs = parse("\n".join(lines))
    out = [d if isinstance(d, str) else d.format() for d in defs]
    expected = COMPREHENSIVE.strip().splitlines()
    for o, e in zip(out, expected):
        if not e.startswith("// Hint:"):
            assert o == e


def test_comprehensive_prune():
    defs = parse(COMPREHENSIVE)
    symbols, indexer = build_type_index(defs)
    # CHOOSE is not pinned in this menu: empty query prunes everything
    reachable = build_filtered_types(defs, symbols, indexer, "")
    assert [d.format() for d in reachable] == ["type Cart=never;"]
    # a drink query keeps the drink subtree
    out = prune_source(COMPREHENSIVE, "lemon fizz small")
    assert '"Lemon Fizz"' in out
    assert '"Classic Stack"' not in out
