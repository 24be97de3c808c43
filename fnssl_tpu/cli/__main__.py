from fnssl_tpu.cli.main import main

main()
