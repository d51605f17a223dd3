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
