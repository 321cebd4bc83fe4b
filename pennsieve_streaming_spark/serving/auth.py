"""Bearer-token auth for the serving layer.

The reference gates every route (except ``/ts/health``) on an OAuth2
bearer JWT extracted from the ``Authorization`` header
(server/WebServer.scala:66-79):

- no credentials            -> 401 Unauthorized
- token that fails to parse -> 400 Bad Request
- a *service* claim         -> 401 Unauthorized (only user/dataset
  claims may query)
- a valid claim             -> request proceeds, claim in scope

This module reproduces that decision tree with a generic HS256 JWT
(public RFC 7519 construction, stdlib ``hmac``/``hashlib``/``base64``
only — no proprietary claim vocabulary): the payload is an arbitrary
JSON claim; a ``{"type": "service"}`` claim models the reference's
rejected ServiceClaim.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from typing import Any


class AuthError(Exception):
    """Base class; ``status`` is the HTTP status the route answers."""

    status = 401


class MissingCredentials(AuthError):
    status = 401


class InvalidToken(AuthError):
    status = 400


class ServiceClaimRejected(AuthError):
    status = 401


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _unb64url(s: str) -> bytes:
    pad = "=" * (-len(s) % 4)
    return base64.urlsafe_b64decode(s + pad)


def sign_token(claim: dict[str, Any], secret: str) -> str:
    """Issue an HS256 JWT for ``claim`` (test/tooling helper)."""
    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    payload = _b64url(json.dumps(claim).encode())
    signing_input = f"{header}.{payload}".encode()
    sig = hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()
    return f"{header}.{payload}.{_b64url(sig)}"


def parse_claim(token: str, secret: str) -> dict[str, Any]:
    """Verify signature + expiry and return the claim dict.

    Raises InvalidToken on any structural, signature, or expiry
    problem (the reference's ``Left(_) => BadRequest`` lane).
    """
    parts = token.split(".")
    if len(parts) != 3:
        raise InvalidToken("malformed token")
    header_b64, payload_b64, sig_b64 = parts
    try:
        header = json.loads(_unb64url(header_b64))
        claim = json.loads(_unb64url(payload_b64))
        sig = _unb64url(sig_b64)
    except Exception as e:
        raise InvalidToken(f"undecodable token: {e}") from e
    if header.get("alg") != "HS256":
        raise InvalidToken("unsupported alg")
    expect = hmac.new(
        secret.encode(), f"{header_b64}.{payload_b64}".encode(), hashlib.sha256
    ).digest()
    if not hmac.compare_digest(sig, expect):
        raise InvalidToken("bad signature")
    exp = claim.get("exp")
    if exp is not None and float(exp) < time.time():
        raise InvalidToken("token expired")
    if not isinstance(claim, dict):
        raise InvalidToken("claim is not an object")
    return claim


def authorize(headers: dict[str, str], secret: str | None) -> dict[str, Any]:
    """Apply the reference's auth decision tree to parsed headers
    (keys lower-cased). ``secret=None`` disables auth (engine-embedded
    use); otherwise raises MissingCredentials / InvalidToken /
    ServiceClaimRejected per WebServer.scala:66-79."""
    if secret is None:
        return {}
    authz = headers.get("authorization", "")
    if not authz.lower().startswith("bearer "):
        raise MissingCredentials("missing bearer credentials")
    claim = parse_claim(authz[7:].strip(), secret)
    if claim.get("type") == "service":
        # the reference rejects pure service claims on query routes
        raise ServiceClaimRejected("service claims may not query")
    return claim
