/* Like enc.c but sets non-default arithmetic conditioning:
 * argv: quality rst dcL dcU acK  (PGM/PPM stdin -> JPEG stdout, arith) */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
static int rdint(FILE *f){int c,v=0;do{c=getc(f);if(c=='#'){while(c!='\n')c=getc(f);}}while(c==' '||c=='\n'||c=='\t'||c=='\r'||c=='#');
  while(c>='0'&&c<='9'){v=v*10+(c-'0');c=getc(f);}return v;}
int main(int argc, char **argv){
  int quality=atoi(argv[1]), rst=atoi(argv[2]);
  int dcL=atoi(argv[3]), dcU=atoi(argv[4]), acK=atoi(argv[5]);
  int c1=getc(stdin), c2=getc(stdin); (void)c1;
  int ncomp=(c2=='6')?3:1;
  int w=rdint(stdin), h=rdint(stdin), maxv=rdint(stdin); (void)maxv;
  unsigned char *buf=malloc((size_t)w*h*ncomp);
  fread(buf,1,(size_t)w*h*ncomp,stdin);
  struct jpeg_compress_struct cinfo; struct jpeg_error_mgr jerr;
  cinfo.err=jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  unsigned char *out=NULL; unsigned long outlen=0;
  jpeg_mem_dest(&cinfo,&out,&outlen);
  cinfo.image_width=w; cinfo.image_height=h;
  cinfo.input_components=ncomp;
  cinfo.in_color_space=(ncomp==3)?JCS_RGB:JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo,quality,TRUE);
  cinfo.arith_code=TRUE;
  cinfo.restart_interval=rst;
  for(int i=0;i<NUM_ARITH_TBLS;i++){
    cinfo.arith_dc_L[i]=dcL; cinfo.arith_dc_U[i]=dcU; cinfo.arith_ac_K[i]=acK;
  }
  jpeg_start_compress(&cinfo,TRUE);
  while(cinfo.next_scanline<cinfo.image_height){
    JSAMPROW row=buf+(size_t)cinfo.next_scanline*w*ncomp;
    jpeg_write_scanlines(&cinfo,&row,1);
  }
  jpeg_finish_compress(&cinfo);
  fwrite(out,1,outlen,stdout);
  jpeg_destroy_compress(&cinfo);
  return 0;
}
