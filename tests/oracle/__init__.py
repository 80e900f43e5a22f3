"""Vendored third-party bit-compatibility oracles - NOT tpgsd code."""
