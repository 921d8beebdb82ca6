"""Expression-level helpers.

``bind`` is the engine's CSE barrier. Spark's higher-order functions
(`transform`/`aggregate`/...) are evaluated interpreted (outside
whole-stage codegen), so common-subexpression elimination does NOT
de-duplicate an expensive subtree that appears in several output
columns — and projection collapse happily inlines a signature
computation into every one of its 16 consumers. A HOF *lambda
variable*, by contrast, is evaluated exactly once per element. Binding
a value as a lambda variable therefore guarantees single evaluation no
matter how many times the continuation references it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(col: Column, f: Callable[[Column], Column]) -> Column:
    """Evaluate ``col`` exactly once and feed it to ``f`` as a lambda
    variable: ``bind(x, f)`` ≡ ``transform(array(x), f)[0]``.

    Use whenever an expensive expression would otherwise be referenced
    more than once in a single projection (MinHash signatures, token
    hash arrays, parsed structs...).
    """
    return F.element_at(F.transform(F.array(col), f), 1)
