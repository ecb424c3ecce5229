"""SASLprep (RFC 4013) unit coverage for the SCRAM client — ADVICE r4:
RFC 5802 §2.2 mandates SASLprep of the password before key derivation."""

import pytest

from iceberg_catalog_postgres_spark.catalog.pgwire import (
    _SASLPREP_MAP_TO_NOTHING,
    PgError,
    _saslprep,
    _ScramClient,
)


def test_ascii_identity():
    # Printable ASCII is the identity under the profile (fast path).
    assert _saslprep("pencil") == "pencil"
    assert _saslprep("p a s s !~") == "p a s s !~"


def test_map_to_nothing_and_space_mapping():
    # RFC 4013 §2.1: B.1 chars dropped, non-ASCII spaces -> U+0020.
    assert _saslprep("I­X") == "IX"  # soft hyphen
    assert _saslprep("a​b") == "ab"  # zero-width space is B.1, dropped
    assert _saslprep("a b") == "a b"  # nbsp -> space
    assert len(_SASLPREP_MAP_TO_NOTHING) == 27


def test_nfkc_normalization():
    # RFC 4013 §2.2 (the RFC's own example): U+2168 ROMAN NUMERAL NINE -> IX.
    assert _saslprep("Ⅸ") == "IX"
    # user + combining ring composes to the precomposed form.
    assert _saslprep("å") == "å"


@pytest.mark.parametrize(
    "bad",
    [
        "",  # C.2.1 ASCII control
        "ab",  # DEL
        "x",  # C.3 private use
        "x﷐",  # non-character
        "اx",  # bidi: RandALCat followed by LCat
        "xا",  # bidi: starts L, contains RandALCat
    ],
)
def test_prohibited_output_raises(bad):
    with pytest.raises(PgError):
        _saslprep(bad)


def test_rtl_only_password_allowed():
    # An all-RandALCat string that starts and ends RandALCat is legal.
    assert _saslprep("اب") == "اب"


def test_scram_client_applies_saslprep():
    # The same derived keys must come out of the NFKC-equivalent spellings.
    a = _ScramClient("café", nonce="n")  # precomposed é
    b = _ScramClient("café", nonce="n")  # e + combining acute
    assert a._password == b._password == "café".encode()


def test_server_final_error_attribute_surfaced():
    # RFC 5802 §7: e= in server-final is the server's error, not a bad sig.
    c = _ScramClient("pw", nonce="n")
    with pytest.raises(PgError, match="invalid-proof"):
        c.verify_server_final(b"e=invalid-proof")


def test_server_final_before_server_first_is_protocol_error():
    # ADVICE r4: previously crashed with TypeError(hmac.new(None, ...)).
    c = _ScramClient("pw", nonce="n")
    with pytest.raises(PgError, match="before server-first"):
        c.verify_server_final(b"v=AAAA")
