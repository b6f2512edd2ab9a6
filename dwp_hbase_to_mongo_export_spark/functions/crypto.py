"""AES-CTR payload crypto + data-key service.

Reference behaviours re-expressed from:
- src/main/kotlin/app/services/impl/AESCipherService.kt:26-59
  (AES/CTR/NoPadding, base64 key/iv/ciphertext)
- src/main/kotlin/app/services/impl/HttpKeyService.kt:43-57,96-160
  (decryptKey with in-process cache; one batch data key per run)

Spark's built-in aes_encrypt/aes_decrypt are GCM/CBC-only, so CTR runs in
an Arrow-batched pandas UDF (operators/decryption.py). The key-service
cache is per-executor (module-level dict), mirroring HttpKeyService's
decryptedKeyCache so a 1000-executor run makes O(distinct kek) service
calls, not O(records).
"""

from __future__ import annotations

import base64
import hashlib

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes


def aes_ctr_decrypt(key_b64: str, iv_b64: str, ciphertext_b64: str) -> bytes:
    key = base64.b64decode(key_b64)
    iv = base64.b64decode(iv_b64)
    ct = base64.b64decode(ciphertext_b64)
    cipher = Cipher(algorithms.AES(key), modes.CTR(iv))
    d = cipher.decryptor()
    return d.update(ct) + d.finalize()


def aes_ctr_encrypt(key_b64: str, iv: bytes, plaintext: bytes) -> str:
    key = base64.b64decode(key_b64)
    cipher = Cipher(algorithms.AES(key), modes.CTR(iv))
    e = cipher.encryptor()
    return base64.b64encode(e.update(plaintext) + e.finalize()).decode("ascii")


class KeyService:
    """decryptKey(kekId, encryptedKey) -> plaintext data key (base64).

    The production implementation would call an external key service over
    mTLS with retry/backoff (HttpKeyService.kt:96-118); LocalKeyService
    below is the deterministic stand-in used by tests and fixtures.
    """

    def decrypt_key(self, kek_id: str, encrypted_key_b64: str) -> str:
        raise NotImplementedError


class LocalKeyService(KeyService):
    """Deterministic KEK: data key = XOR(encrypted_key, stretch(kek_id)).

    Fixtures encrypt with the same XOR so decrypt_key round-trips. The
    per-process cache mirrors HttpKeyService.decryptedKeyCache
    (HttpKeyService.kt:100-104): keyed (kekId, encryptedKey)."""

    def __init__(self) -> None:
        self._cache: dict[tuple[str, str], str] = {}

    def _pad(self, kek_id: str, n: int) -> bytes:
        out = b""
        counter = 0
        while len(out) < n:
            out += hashlib.sha256(f"{kek_id}:{counter}".encode()).digest()
            counter += 1
        return out[:n]

    def encrypt_data_key(self, kek_id: str, plaintext_key_b64: str) -> str:
        raw = base64.b64decode(plaintext_key_b64)
        enc = bytes(a ^ b for a, b in zip(raw, self._pad(kek_id, len(raw))))
        return base64.b64encode(enc).decode("ascii")

    def decrypt_key(self, kek_id: str, encrypted_key_b64: str) -> str:
        cache_key = (kek_id, encrypted_key_b64)
        if cache_key not in self._cache:
            enc = base64.b64decode(encrypted_key_b64)
            raw = bytes(a ^ b for a, b in zip(enc, self._pad(kek_id, len(enc))))
            self._cache[cache_key] = base64.b64encode(raw).decode("ascii")
        return self._cache[cache_key]


# Per-executor singleton so every pandas-UDF batch on an executor shares
# one cache (broadcast of the *service config*, not the keys themselves).
_LOCAL_SERVICE: LocalKeyService | None = None


def local_key_service() -> LocalKeyService:
    global _LOCAL_SERVICE
    if _LOCAL_SERVICE is None:
        _LOCAL_SERVICE = LocalKeyService()
    return _LOCAL_SERVICE
