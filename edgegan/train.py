from edgegan_tpu.cli.train import main

if __name__ == '__main__':
    main()
