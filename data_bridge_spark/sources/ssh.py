"""SSH client construction for SFTP sources/sinks.

Host keys are verified, never blindly trusted: known hosts are loaded
from the system, and unknown hosts are rejected unless the config pins
an explicit SHA256 host-key fingerprint (the ``ssh-keyscan``/OpenSSH
``SHA256:...`` form). The reference trusts whatever endpoint its
``pysftp`` default connects to; this is the hardened equivalent.
"""

from __future__ import annotations


def open_ssh_client(
    host: str,
    port: int = 22,
    user: str = "",
    password: str = "",
    host_key_fingerprint: str = "",
):
    """Connect with verified host identity; returns a paramiko SSHClient.

    - ``host_key_fingerprint`` set: the presented key's SHA256 fingerprint
      must match (keys already in known_hosts are also accepted).
    - unset: only hosts present in the system known_hosts are accepted
      (RejectPolicy for anything unknown).
    """
    import paramiko  # gated: not installed in all environments

    client = paramiko.SSHClient()
    client.load_system_host_keys()
    if host_key_fingerprint:
        expected = host_key_fingerprint.removeprefix("SHA256:").rstrip("=")

        class _PinnedFingerprint(paramiko.MissingHostKeyPolicy):
            def missing_host_key(self, client, hostname, key):  # noqa: ANN001
                import base64
                import hashlib

                got = (
                    base64.b64encode(hashlib.sha256(key.asbytes()).digest())
                    .decode()
                    .rstrip("=")
                )
                if got != expected:
                    raise paramiko.SSHException(
                        f"host key fingerprint mismatch for {hostname}: "
                        f"got SHA256:{got}, pinned SHA256:{expected}"
                    )

        client.set_missing_host_key_policy(_PinnedFingerprint())
    else:
        client.set_missing_host_key_policy(paramiko.RejectPolicy())
    client.connect(host, port=port, username=user, password=password)
    return client
