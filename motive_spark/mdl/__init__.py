from motive_spark.mdl.codes import (
    log2_choose,
    log2_factorial,
    online_multiset_bits,
    prefix_bits,
    store_integers_bits,
)
from motive_spark.mdl.models import el_bits, er_bits

__all__ = [
    "prefix_bits",
    "log2_factorial",
    "log2_choose",
    "online_multiset_bits",
    "store_integers_bits",
    "er_bits",
    "el_bits",
]
