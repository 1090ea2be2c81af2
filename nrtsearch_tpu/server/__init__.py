"""Server: gRPC front-end, request handlers, per-index runtime.

Reference layers L1-L3 (SURVEY.md §1): NrtsearchServer (grpc bootstrap),
handler-per-RPC (server/handler/), ShardState (per-index runtime).
"""
