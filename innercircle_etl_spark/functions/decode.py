"""Ethereum ABI decode UDFs (reference D1/D2, SURVEY §2.10).

The reference decodes OpenSea Wyvern trades row-by-row in pandas with
web3 (`decode_utls.py:69-97` OrdersMatched log → price;
`decode_utls.py:186-200` atomicMatch_ calldata → payment token).
Both events have FIXED ABI layouts, so the decode is deterministic
hex slicing — no web3 dependency, no per-row codec object:

- ``OrdersMatched(bytes32 buyHash, bytes32 sellHash, address indexed
  maker, address indexed taker, uint256 price, bytes32 indexed
  metadata)``: the non-indexed fields land in ``data`` as three
  32-byte words → price is word 2 (0-based), i.e. hex chars
  [2+128, 2+192). Reference divides by 1e18 (`decode_utls.py:97`).
- ``atomicMatch_(address[14] addrs, ...)``: calldata is a 4-byte
  selector (0xab834bab) + head words; a fixed-size address array is
  inlined, so ``addrs[6]`` is head word 6 → the last 40 hex chars of
  chars [10+6*64, 10+7*64). Reference lowercases it
  (`decode_utls.py:193-194`) and returns an ``<error> ...`` sentinel
  string on failure (`decode_utls.py:196-200`).

Spark-first shape: Arrow-batched pandas UDFs doing vectorized string
slicing (the reference's per-row ``df.apply`` + web3 codec is the
slow path this replaces). Executor-side setup (the reference's
``lru_cache`` contract cache, `decode_utls.py:174-184`) is
unnecessary because the layouts are static constants.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

ORDERS_MATCHED_TOPIC = "0xc4109843"  # decode_utls.py:111 prefix filter
ATOMIC_MATCH_SELECTOR = "0xab834bab"  # decode_utls.py:218 prefix filter

WEI_PER_ETH = 10**18
_WORD = 64  # hex chars per 32-byte ABI word

# sentinel contract (reference: '<error> decoding error: <exc>',
# decode_utls.py:198-200; deterministic message here)
DECODE_ERROR = "<error> decoding error"


@F.pandas_udf(DoubleType())
def orders_matched_price(data: pd.Series) -> pd.Series:
    """D1: OrdersMatched log ``data`` hex → trade price in ETH.

    price = uint256 at word 2 of the non-indexed data, / 1e18.
    Malformed rows (short data / no 0x) decode to null — upstream
    filters on the topic prefix make them impossible in the
    reference pipeline, but a distributed engine must not crash on
    one bad row.
    """
    word = data.str.slice(2 + 2 * _WORD, 2 + 3 * _WORD)
    # fullmatch (not just a length check) so a correct-length word with
    # non-hex characters yields null instead of raising in int() and
    # failing the whole Arrow batch. fillna: null input rows.
    ok = (
        data.str.startswith("0x").fillna(False)
        & word.str.fullmatch(r"[0-9a-fA-F]{64}").fillna(False)
    )
    ints = word.where(ok).map(
        lambda h: int(h, 16) / WEI_PER_ETH, na_action="ignore"
    )
    return ints.astype("float64")


@F.pandas_udf(StringType())
def atomic_match_payment_token(input_data: pd.Series) -> pd.Series:
    """D2: atomicMatch_ calldata → payment-token address
    (``addrs[6]``, lowercased '0x' + 40 hex chars) or the
    ``<error>`` sentinel the reference emits on undecodable input.
    """
    word6 = input_data.str.slice(10 + 6 * _WORD, 10 + 7 * _WORD)
    ok = input_data.str.startswith(ATOMIC_MATCH_SELECTOR) & (
        word6.str.len() == _WORD
    )
    token = "0x" + word6.str.slice(_WORD - 40, _WORD).str.lower()
    return token.where(ok, DECODE_ERROR)
