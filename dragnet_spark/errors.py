"""Shared typed errors for contract failures.

``ContractError`` is the loud-guard type: a user-visible parameter or
resume/layout contract was violated (mismatched resume manifest, a
broadcast/all-pairs cap, an invalid band geometry). It subclasses
``ValueError`` so existing callers catching ``ValueError`` keep
working, while ``cli.main`` can catch it by name and deliver
``dn: error: ...`` + exit 1 instead of a Python traceback — the
reference CLI's failure contract (ref. bin/dn: fatal() prints one
line and exits nonzero, never a stack trace).
"""


class ContractError(ValueError):
    """A loud contract-failure: excellent message, one-line delivery."""
