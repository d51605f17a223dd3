"""Deterministic type-graph / cart fixtures for the typefilter query
entries (F4/F6 in FIXTURES.md). Self-contained — no external data."""

from __future__ import annotations

import json
import random

import pyarrow as pa

MENU_SOURCE = """
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
type CHOOSE=LITERAL<"CHOOSE",[],true>;
"""

_QUERY_TERMS = ["cola", "lemon fizz", "curly fries", "tots", "wrap",
                "classic stack", "veggie", "toasted", "lettuce", "ranch",
                "iced tea", "jalapeños", "fire sauce", "small", "large"]


def prune_queries_table(n: int = 60, seed: int = 11) -> pa.Table:
    rng = random.Random(seed)
    queries = []
    for _ in range(n):
        k = rng.randint(1, 3)
        queries.append(" ".join(rng.choice(_QUERY_TERMS) for _ in range(k)))
    return pa.table({
        "source": pa.array([MENU_SOURCE] * n, type=pa.string()),
        "query": pa.array(queries, type=pa.string()),
    })


def carts_table(n: int = 80, seed: int = 12) -> pa.Table:
    rng = random.Random(seed)
    carts = []
    for _ in range(n):
        items = []
        for _ in range(rng.randint(0, 3)):
            r = rng.random()
            if r < 0.4:
                items.append({"name": rng.choice(
                    ["Classic Stack", "Double Stack", "Veggie Stack"]),
                    "style": rng.choice(["Plain", "Toasted", "CHOOSE"])})
            elif r < 0.7:
                items.append({"name": rng.choice(["Cola", "Lemon Fizz"]),
                              "size": rng.choice(["Small", "Large"])})
            else:  # invalid on purpose sometimes
                items.append({"name": "Mystery Meat"})
        carts.append(json.dumps({"items": items}, sort_keys=True))
    return pa.table({"cart": pa.array(carts, type=pa.string())})


# ---------------------------------------------------------------------------
# Reference-golden conformance fixtures (r5: the value-exact AST gate).
# The graph and every expected output mirror the REFERENCE's own test
# suite (/root/reference/tests/test_type_filter.py:30-159 for pruning;
# tests/test_validator.py and tests/test_create_defaults.py for the
# validator/normalizer semantics) — the oracle side of the driver gate
# embeds these expected values as SQL literals, so the engine is
# string-compared against the reference's published behavior, never
# against itself.
# ---------------------------------------------------------------------------

# the reference's 14-type conformance graph, serialized as TS source
REFERENCE_GRAPH_SOURCE = """
type Cart={items:Item[]};
type Item=J|P|Q<V>|R<WXYZ>;
type P={p1:V,p2:W,p3:X,p4:Y};
type Q<T>={q1:T};
type R<T extends WXYZ>={r1:T};
type WXYZ=W|X|Y|Z;
type V="v";
type W="w";
type X="x";
type Y="y";
type Z="z";
type J=K;
type K=L;
type L="l"|"m";
"""

# (query, expected formatted lines) — reference goldens, one tuple per
# conformance case (test_type_filter.py:60-159)
PRUNE_GOLDENS: list[tuple[str, list[str]]] = [
    ("", ["type Cart=never;"]),
    ("bad", ["type Cart=never;"]),
    ("v w x y z", [
        "type Cart={items:Item[]};",
        "type Item=P|Q<V>|R<WXYZ>;",
        "type P={p1:V,p2:W,p3:X,p4:Y};",
        "type Q<T>={q1:T};",
        "type R<T extends WXYZ>={r1:T};",
        "type WXYZ=W|X|Y|Z;",
        'type V="v";',
        'type W="w";',
        'type X="x";',
        'type Y="y";',
        'type Z="z";']),
    ("v", [
        "type Cart={items:Item[]};",
        "type Item=Q<V>;",
        "type Q<T>={q1:T};",
        'type V="v";']),
    ("v w", [
        "type Cart={items:Item[]};",
        "type Item=Q<V>|R<WXYZ>;",
        "type Q<T>={q1:T};",
        "type R<T extends WXYZ>={r1:T};",
        'type WXYZ="w";',
        'type V="v";']),
    ("w x y z", [
        "type Cart={items:Item[]};",
        "type Item=R<WXYZ>;",
        "type R<T extends WXYZ>={r1:T};",
        "type WXYZ=W|X|Y|Z;",
        'type W="w";',
        'type X="x";',
        'type Y="y";',
        'type Z="z";']),
    ("x y", [
        "type Cart={items:Item[]};",
        "type Item=R<WXYZ>;",
        "type R<T extends WXYZ>={r1:T};",
        "type WXYZ=X|Y;",
        'type X="x";',
        'type Y="y";']),
    ("l", [
        "type Cart={items:Item[]};",
        'type Item="l";']),
    ("l m", [
        "type Cart={items:Item[]};",
        'type Item="l"|"m";']),
]

# validator golden graph (the reference's nested menu-cart shape,
# tests/test_validator.py) + carts with reference-semantics expected
# verdicts: strict literals, optional fields, generic positional
# binding, extra-key rejection
VALIDATE_GRAPH_SOURCE = """
type Cart={items:Item[]};
type Item=Burger|Drink<"Cola"|"Tea">;
type Burger={name:"burger",options?:Option[]};
type Option={name:"cheese"|"bacon",amount:"No"|"Regular"|"Extra"};
type Drink<NAME>={name:NAME,size:"S"|"L"};
"""

VALIDATE_GOLDENS: list[tuple[str, bool]] = [
    ('{"items": []}', True),
    ('{"items": [{"name": "burger"}]}', True),
    ('{"items": [{"name": "burger", "options": '
     '[{"name": "cheese", "amount": "Extra"}]}]}', True),
    ('{"items": [{"name": "Cola", "size": "S"}]}', True),
    ('{"items": [{"name": "Tea", "size": "L"}]}', True),
    ('{"items": [{"name": "Cola", "size": "XL"}]}', False),
    ('{"items": [{"name": "burger", "extra": 1}]}', False),
    ('{"items": [{"name": "pizza"}]}', False),
    ('{"items": [{"name": "Cola"}]}', False),           # required missing
    ('{"items": [{"name": "burger", "options": []}]}', True),
    ('{"items": [{"name": "burger", "options": '
     '[{"name": "ketchup", "amount": "No"}]}]}', False),
    ('{"items": [{"name": "burger", "options": '
     '[{"name": "bacon"}]}]}', False),                  # amount required
    ('{"items": [{"name": "burger"}, '
     '{"name": "Tea", "size": "S"}]}', True),
    ('{"items": {}}', False),                           # list expected
    ('{}', False),                                      # items required
]

# normalizer golden graph: two named structs with optional fields →
# spec {types, defaults}; the stage strips optional fields that hold
# their default (None) and leaves everything else canonical-JSON
NORMALIZE_GRAPH_SOURCE = """
type Foo={name:"a"|"b",field1?:"x",field2?:"y"};
type Bar={name:"c",field3:"hello",field4?:"z"};
"""

# expected side is the stage's canonical form: json.dumps(sort_keys=True)
NORMALIZE_GOLDENS: list[tuple[str, str]] = [
    ('{"name": "a", "field1": null, "field2": null}',
     '{"name": "a"}'),
    ('{"name": "a", "field1": "x"}',
     '{"field1": "x", "name": "a"}'),
    ('{"name": "b", "field2": null}',
     '{"name": "b"}'),
    ('{"name": "c", "field3": "hello", "field4": null}',
     '{"field3": "hello", "name": "c"}'),
    ('{"items": [{"name": "a", "field1": null}, '
     '{"name": "c", "field3": "hello"}]}',
     '{"items": [{"name": "a"}, {"field3": "hello", "name": "c"}]}'),
    ('{"name": "unknown", "field9": null}',
     '{"field9": null, "name": "unknown"}'),
]


def prune_golden_table() -> pa.Table:
    """(case_id, source, query) rows for the reference conformance
    cases — the PruneTypesStage gate input."""
    return pa.table({
        "case_id": pa.array(range(len(PRUNE_GOLDENS)), type=pa.int64()),
        "source": pa.array([REFERENCE_GRAPH_SOURCE] * len(PRUNE_GOLDENS),
                           type=pa.string()),
        "query": pa.array([q for q, _ in PRUNE_GOLDENS],
                          type=pa.string()),
    })


def validate_golden_table() -> pa.Table:
    return pa.table({
        "cart_id": pa.array(range(len(VALIDATE_GOLDENS)),
                            type=pa.int64()),
        "cart": pa.array([c for c, _ in VALIDATE_GOLDENS],
                         type=pa.string()),
    })


def normalize_golden_table() -> pa.Table:
    return pa.table({
        "cart_id": pa.array(range(len(NORMALIZE_GOLDENS)),
                            type=pa.int64()),
        "cart": pa.array([c for c, _ in NORMALIZE_GOLDENS],
                         type=pa.string()),
    })
