from geobignn_tpu.cli import main

main()
