from nrtsearch_tpu.server.grpc_server import main

main()
