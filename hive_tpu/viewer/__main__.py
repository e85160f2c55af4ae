from hive_tpu.viewer import main

main()
