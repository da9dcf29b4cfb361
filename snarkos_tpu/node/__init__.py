"""The node harness: networking, consensus, ledger, REST, CLI.

Re-creates snarkOS's node capabilities (SURVEY.md §1 layers 1-11) around
the TPU crypto library: an asyncio TCP stack with opt-in protocol hooks,
the public router plane and the validator-only gateway plane, AleoBFT-style
DAG consensus (primary/worker/BFT/storage), block sync, a ledger with
pluggable service seams, REST API, and the CLI entrypoint.
"""
