float cylinder_fa0113ce8a(vec3 p) {
float dx = length(p.xy)-36.5+1.825;
float dy = abs(p.z)-0.67499995;
return min(max(dx,dy),0.0)+length(max(vec2(dx,dy),0.0))-1.825;
}

float polygon2d_5cdc930bae(vec2 p) {
vec2 v[5] = vec2[5](vec2(0.5,0.0),vec2(0.5,36.5),vec2(0.0,36.8),vec2(-0.5,36.5),vec2(-0.5,0.0));
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j=4; i<5; j=i, i++) {
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}
return s*sqrt(d);
}

float screwnode_841606928f(vec3 p) {
float y = length(p.xy) + p.z*0.0;
float theta = atan(p.y,p.x);
float z = p.z + -229.0*theta/6.283185307179586;
float t = (z+0.5)/1.0;
float x = 1.0*(t-floor(t))-0.5;
float d2 = polygon2d_5cdc930bae(vec2(x,y));
return max(d2, abs(p.z)-1.5);
}

float screwnode_144b52a83d(vec3 p) {
float y = length(p.xy) + p.z*0.0;
float theta = atan(p.y,p.x);
float z = p.z + 229.0*theta/6.283185307179586;
float t = (z+0.5)/1.0;
float x = 1.0*(t-floor(t))-0.5;
float d2 = polygon2d_5cdc930bae(vec2(x,y));
return max(d2, abs(p.z)-1.5);
}

float intersection_c9c9906ca0(vec3 p) {
return max(screwnode_841606928f(p),screwnode_144b52a83d(p));
}

float opunion_611049d64b(vec3 p) {
float d = cylinder_fa0113ce8a(p);
d = min(d,intersection_c9c9906ca0(p));
return d;
}

float polygon2d_f090c70384(vec2 p) {
vec2 v[22] = vec2[22](vec2(1.6666666,0.0),vec2(1.6666666,32.5),vec2(0.8773217,32.5),vec2(0.8535144,32.49653),vec2(0.83169144,32.486397),vec2(0.81367207,32.470455),vec2(0.80095816,32.450027),vec2(0.79460955,32.426823),vec2(0.71353865,31.766554),vec2(0.6760152,31.662327),vec2(0.5971411,31.584547),vec2(0.49240196,31.548483),vec2(0.38236183,31.561214),vec2(0.28862542,31.620243),vec2(-0.5179077,32.426777),vec2(-0.5477381,32.452255),vec2(-0.5811868,32.47275),vec2(-0.61743015,32.487762),vec2(-0.65557575,32.49692),vec2(-0.6946844,32.5),vec2(-1.6666666,32.5),vec2(-1.6666666,0.0));
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j=21; i<22; j=i, i++) {
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}
return s*sqrt(d);
}

float screwnode_80e066040a(vec3 p) {
float y = length(p.xy) + p.z*0.0;
float theta = atan(p.y,p.x);
float z = p.z + -1.6666666*theta/6.283185307179586;
float t = (z+0.8333333)/1.6666666;
float x = 1.6666666*(t-floor(t))-0.8333333;
float d2 = polygon2d_f090c70384(vec2(x,y));
return max(d2, abs(p.z)-2.75);
}

float difference_a9f436ac01(vec3 p) {
return max(opunion_611049d64b(p),-screwnode_80e066040a(p));
}

float cylinder_948135b426(vec3 p) {
float dx = length(p.xy)-36.5;
float dy = abs(p.z)-1.25;
return min(0.0,max(dx,dy))+length(max(vec2(dx,dy),0.0));
}

float translate_1b56ea31dc(vec3 p) {
return cylinder_948135b426(p-vec3(0.0,0.0,-2.75));
}

float cylinder_42103e6013(vec3 p) {
float dx = length(p.xy)-0.8;
float dy = abs(p.z)-12.5;
return min(0.0,max(dx,dy))+length(max(vec2(dx,dy),0.0));
}

float translate_ed33de0d9a(vec3 p) {
return cylinder_42103e6013(p-vec3(0.0,0.0,0.0));
}

float translate_cbe9fbb850(vec3 p) {
return cylinder_42103e6013(p-vec3(0.94656676,2.421572,0.0));
}

float translate_d0f05f08d9(vec3 p) {
return cylinder_42103e6013(p-vec3(-2.702248,2.4935627,0.0));
}

float translate_51a0fef8d9(vec3 p) {
return cylinder_42103e6013(p-vec3(-4.049289,-1.970598,0.0));
}

float translate_9404703ee4(vec3 p) {
return cylinder_42103e6013(p-vec3(0.41703442,-5.18325,0.0));
}

float translate_601286a209(vec3 p) {
return cylinder_42103e6013(p-vec3(5.5671062,-1.6755087,0.0));
}

float translate_9263d5f387(vec3 p) {
return cylinder_42103e6013(p-vec3(3.9297,5.011732,0.0));
}

float translate_bfe123a6ed(vec3 p) {
return cylinder_42103e6013(p-vec3(-3.4965038,5.924058,0.0));
}

float translate_44f57a1a79(vec3 p) {
return cylinder_42103e6013(p-vec3(-7.2593117,-1.1757519,0.0));
}

float translate_62d7f91920(vec3 p) {
return cylinder_42103e6013(p-vec3(-1.6416798,-7.6252794,0.0));
}

float translate_b6bcb8637a(vec3 p) {
return cylinder_42103e6013(p-vec3(6.856144,-4.537983,0.0));
}

float translate_34ba5428b6(vec3 p) {
return cylinder_42103e6013(p-vec3(7.050759,4.9645543,0.0));
}

float translate_38b9c23b7f(vec3 p) {
return cylinder_42103e6013(p-vec3(-2.1483908,8.74668,0.0));
}

float translate_8808a268fa(vec3 p) {
return cylinder_42103e6013(p-vec3(-9.293162,1.2317194,0.0));
}

float translate_af4b61b627(vec3 p) {
return cylinder_42103e6013(p-vec3(-4.7015204,-8.516789,0.0));
}

float translate_614d811502(vec3 p) {
return cylinder_42103e6013(p-vec3(6.4389954,-7.74205,0.0));
}

float translate_c66e983b51(vec3 p) {
return cylinder_42103e6013(p-vec3(9.868311,3.28275,0.0));
}

float translate_23b238e121(vec3 p) {
return cylinder_42103e6013(p-vec3(0.5517029,10.705869,0.0));
}

float translate_2663a4b524(vec3 p) {
return cylinder_42103e6013(p-vec3(-10.053567,4.5393596,0.0));
}

float translate_6cf9d74089(vec3 p) {
return cylinder_42103e6013(p-vec3(-8.104134,-7.9223113,0.0));
}

float translate_b3d8fd6a54(vec3 p) {
return cylinder_42103e6013(p-vec3(4.543247,-10.703219,0.0));
}

float translate_f879a2b3a2(vec3 p) {
return cylinder_42103e6013(p-vec3(11.909757,0.34307122,0.0));
}

float translate_01c22c55d7(vec3 p) {
return cylinder_42103e6013(p-vec3(4.1109037,11.48131,0.0));
}

float translate_42d94825be(vec3 p) {
return cylinder_42103e6013(p-vec3(-9.403454,8.188716,0.0));
}

float translate_455401e88b(vec3 p) {
return cylinder_42103e6013(p-vec3(-11.287882,-5.901162,0.0));
}

float translate_621b277222(vec3 p) {
return cylinder_42103e6013(p-vec3(1.4152694,-12.922732,0.0));
}

float translate_3e43b35892(vec3 p) {
return cylinder_42103e6013(p-vec3(12.7997055,-3.4536257,0.0));
}

float translate_8a94431bb9(vec3 p) {
return cylinder_42103e6013(p-vec3(8.026573,10.867112,0.0));
}

float translate_0391c3ef93(vec3 p) {
return cylinder_42103e6013(p-vec3(-7.331262,11.641847,0.0));
}

float translate_2bcd51ac9c(vec3 p) {
return cylinder_42103e6013(p-vec3(-13.75113,-2.6356072,0.0));
}

float translate_bd0dcacc0a(vec3 p) {
return cylinder_42103e6013(p-vec3(-2.5951772,-14.002323,0.0));
}

float translate_ca0fa7580a(vec3 p) {
return cylinder_42103e6013(p-vec3(12.296544,-7.6390443,0.0));
}

float translate_35a0467304(vec3 p) {
return cylinder_42103e6013(p-vec3(11.777014,8.810332,0.0));
}

float translate_895d3b7c1c(vec3 p) {
return cylinder_42103e6013(p-vec3(-3.9788742,14.39613,0.0));
}

float translate_fab25db0f0(vec3 p) {
return cylinder_42103e6013(p-vec3(-15.080167,1.5583837,0.0));
}

float translate_cee40f8dac(vec3 p) {
return cylinder_42103e6013(p-vec3(-7.042928,-13.67469,0.0));
}

float translate_f38a2dbc79(vec3 p) {
return cylinder_42103e6013(p-vec3(10.316465,-11.701733,0.0));
}

float translate_56655072ec(vec3 p) {
return cylinder_42103e6013(p-vec3(14.856685,5.422078,0.0));
}

float translate_07b4f46fde(vec3 p) {
return cylinder_42103e6013(p-vec3(0.3636207,16.023352,0.0));
}

float translate_8765162b48(vec3 p) {
return cylinder_42103e6013(p-vec3(-14.984709,6.25288,0.0));
}

float translate_d6f03c88bd(vec3 p) {
return cylinder_42103e6013(p-vec3(-11.422853,-11.8287115,0.0));
}

float translate_d034af7575(vec3 p) {
return cylinder_42103e6013(p-vec3(6.943501,-15.131021,0.0));
}

float translate_8cfd03d84b(vec3 p) {
return cylinder_42103e6013(p-vec3(16.821985,0.9699496,0.0));
}

float translate_73c0a373c4(vec3 p) {
return cylinder_42103e6013(p-vec3(5.282684,16.210281,0.0));
}

float translate_3ec28e1bbc(vec3 p) {
return cylinder_42103e6013(p-vec3(-13.32691,10.946847,0.0));
}

float translate_03f755f17a(vec3 p) {
return cylinder_42103e6013(p-vec3(-15.217491,-8.522204,0.0));
}

float translate_4ad7e6e87e(vec3 p) {
return cylinder_42103e6013(p-vec3(2.423705,-17.466702,0.0));
}

float translate_d3c73a8534(vec3 p) {
return cylinder_42103e6013(p-vec3(17.335829,-4.1459675,0.0));
}

float translate_d89b1b8385(vec3 p) {
return cylinder_42103e6013(p-vec3(10.280451,14.791631,0.0));
}

float translate_8d1b77effd(vec3 p) {
return cylinder_42103e6013(p-vec3(-10.137774,15.115076,0.0));
}

float translate_0fb9643cc3(vec3 p) {
return cylinder_42103e6013(p-vec3(-17.948984,-3.979194,0.0));
}

float translate_76b084a8d6(vec3 p) {
return cylinder_42103e6013(p-vec3(-2.8566089,-18.346657,0.0));
}

float translate_043bce28ea(vec3 p) {
return cylinder_42103e6013(p-vec3(16.204172,-9.431054,0.0));
}

float translate_3a82ac56aa(vec3 p) {
return cylinder_42103e6013(p-vec3(14.823708,11.770204,0.0));
}

float translate_42e6395883(vec3 p) {
return cylinder_42103e6013(p-vec3(-5.6179404,18.2614,0.0));
}

float translate_1dc23669ba(vec3 p) {
return cylinder_42103e6013(p-vec3(-19.229094,1.4289685,0.0));
}

float translate_84aeac8ac9(vec3 p) {
return cylinder_42103e6013(p-vec3(-8.406927,-17.546612,0.0));
}

float translate_084ab065a1(vec3 p) {
return cylinder_42103e6013(p-vec3(13.3998575,-14.34447,0.0));
}

float translate_8a47686445(vec3 p) {
return cylinder_42103e6013(p-vec3(18.397764,7.321359,0.0));
}

float translate_0addb197d6(vec3 p) {
return cylinder_42103e6013(p-vec3(-0.12199501,19.970606,0.0));
}

float translate_9daac92a71(vec3 p) {
return cylinder_42103e6013(p-vec3(-18.801855,7.217356,0.0));
}

float translate_fdc485295c(vec3 p) {
return cylinder_42103e6013(p-vec3(-13.67973,-15.007497,0.0));
}

float translate_5c5cc3cef1(vec3 p) {
return cylinder_42103e6013(p-vec3(9.07074,-18.353247,0.0));
}

float translate_c8e0eea2aa(vec3 p) {
return cylinder_42103e6013(p-vec3(20.559893,1.7806797,0.0));
}

float translate_46c867e56a(vec3 p) {
return cylinder_42103e6013(p-vec3(5.872702,19.953732,0.0));
}

float translate_c1d5cc5a81(vec3 p) {
return cylinder_42103e6013(p-vec3(-16.574331,12.83322,0.0));
}

float translate_c48f687ff1(vec3 p) {
return cylinder_42103e6013(p-vec3(-18.124475,-10.847275,0.0));
}

float translate_d08556fac8(vec3 p) {
return cylinder_42103e6013(p-vec3(3.5308454,-20.986975,0.0));
}

float translate_f55f353853(vec3 p) {
return cylinder_42103e6013(p-vec3(20.987062,-4.3844256,0.0));
}

float translate_815547bbf9(vec3 p) {
return cylinder_42103e6013(p-vec3(11.810069,18.082098,0.0));
}

float translate_1bd11fad36(vec3 p) {
return cylinder_42103e6013(p-vec3(-12.632125,17.709585,0.0));
}

float translate_c925964e59(vec3 p) {
return cylinder_42103e6013(p-vec3(-21.24328,-5.355655,0.0));
}

float translate_78d50df981(vec3 p) {
return cylinder_42103e6013(p-vec3(-2.765068,-21.887768,0.0));
}

float translate_661adbf9e7(vec3 p) {
return cylinder_42103e6013(p-vec3(19.513145,-10.616833,0.0));
}

float translate_0b12e62719(vec3 p) {
return cylinder_42103e6013(p-vec3(17.108267,14.406499,0.0));
}

float translate_146603bc43(vec3 p) {
return cylinder_42103e6013(p-vec3(-7.2377434,21.321705,0.0));
}

float translate_67218bc7a9(vec3 p) {
return cylinder_42103e6013(p-vec3(-22.64294,1.0282099,0.0));
}

float translate_17cffb78b0(vec3 p) {
return cylinder_42103e6013(p-vec3(-9.261467,-20.850546,0.0));
}

float translate_21bd6a6118(vec3 p) {
return cylinder_42103e6013(p-vec3(16.151756,-16.321789,0.0));
}

float translate_1199d6c9db(vec3 p) {
return cylinder_42103e6013(p-vec3(21.216673,9.159301,0.0));
}

float translate_7acee81d6c(vec3 p) {
return cylinder_42103e6013(p-vec3(-0.8115915,23.24094,0.0));
}

float translate_14f6a2ed0c(vec3 p) {
return cylinder_42103e6013(p-vec3(-22.078184,7.7533064,0.0));
}

float translate_724afb6529(vec3 p) {
return cylinder_42103e6013(p-vec3(-15.353005,-17.849516,0.0));
}

float translate_10499b2368(vec3 p) {
return cylinder_42103e6013(p-vec3(11.102177,-20.924189,0.0));
}

float translate_33f13dde63(vec3 p) {
return cylinder_42103e6013(p-vec3(23.67147,2.7388825,0.0));
}

float translate_2d1783f81d(vec3 p) {
return cylinder_42103e6013(p-vec3(6.1030164,23.18088,0.0));
}

float translate_1af31a1c40(vec3 p) {
return cylinder_42103e6013(p-vec3(-19.481773,14.206354,0.0));
}

float translate_10d0ce9e1f(vec3 p) {
return cylinder_42103e6013(p-vec3(-20.441864,-13.0479965,0.0));
}

float translate_0cb0c07b92(vec3 p) {
return cylinder_42103e6013(p-vec3(4.737407,-23.925655,0.0));
}

float translate_72724c26ab(vec3 p) {
return cylinder_42103e6013(p-vec3(24.144476,-4.3225284,0.0));
}

float translate_732008a83f(vec3 p) {
return cylinder_42103e6013(p-vec3(12.887827,21.031023,0.0));
}

float translate_14933f6a8c(vec3 p) {
return cylinder_42103e6013(p-vec3(-14.978274,19.768948,0.0));
}

float translate_26f8a1668e(vec3 p) {
return cylinder_42103e6013(p-vec3(-23.996103,-6.790213,0.0));
}

float translate_0d3683ee31(vec3 p) {
return cylinder_42103e6013(p-vec3(-2.4249668,-24.955952,0.0));
}

float translate_407e3818b6(vec3 p) {
return cylinder_42103e6013(p-vec3(22.480375,-11.404944,0.0));
}

float translate_40e92eb554(vec3 p) {
return cylinder_42103e6013(p-vec3(18.906336,16.87455,0.0));
}

float translate_417ef405aa(vec3 p) {
return cylinder_42103e6013(p-vec3(-8.879766,23.87697,0.0));
}

float translate_84434c1b1c(vec3 p) {
return cylinder_42103e6013(p-vec3(-25.60351,0.42456117,0.0));
}

float translate_f0b685aa5f(vec3 p) {
return cylinder_42103e6013(p-vec3(-9.766704,-23.813683,0.0));
}

float translate_088ffe6ca9(vec3 p) {
return cylinder_42103e6013(p-vec3(18.718513,-17.856575,0.0));
}

float translate_356056f677(vec3 p) {
return cylinder_42103e6013(p-vec3(23.564003,10.988075,0.0));
}

float translate_509931525e(vec3 p) {
return cylinder_42103e6013(p-vec3(-1.6634527,26.076674,0.0));
}

float translate_bc503c2333(vec3 p) {
return cylinder_42103e6013(p-vec3(-25.015665,7.9835167,0.0));
}

float translate_ce179ee75e(vec3 p) {
return cylinder_42103e6013(p-vec3(-16.62384,-20.492144,0.0));
}

float translate_b7c30052d4(vec3 p) {
return cylinder_42103e6013(p-vec3(13.09682,-23.054573,0.0));
}

float translate_a7f9665a0a(vec3 p) {
return cylinder_42103e6013(p-vec3(26.366364,3.8229408,0.0));
}

float translate_2fc64dc4d9(vec3 p) {
return cylinder_42103e6013(p-vec3(6.067147,26.07201,0.0));
}

float translate_c7122c9aa1(vec3 p) {
return cylinder_42103e6013(p-vec3(-22.177837,15.213926,0.0));
}

float translate_cf7cc18a67(vec3 p) {
return cylinder_42103e6013(p-vec3(-22.347712,-15.187489,0.0));
}

float translate_01f5543376(vec3 p) {
return cylinder_42103e6013(p-vec3(6.0369864,-26.464973,0.0));
}

float translate_dd842f87c8(vec3 p) {
return cylinder_42103e6013(p-vec3(26.969503,-4.030619,0.0));
}

float translate_c08fc128ec(vec3 p) {
return cylinder_42103e6013(p-vec3(13.634197,23.758549,0.0));
}

float translate_19f50e5a65(vec3 p) {
return cylinder_42103e6013(p-vec3(-17.241514,21.444118,0.0));
}

float translate_51a117cc99(vec3 p) {
return cylinder_42103e6013(p-vec3(-26.366434,-8.288015,0.0));
}

float translate_3be86d8342(vec3 p) {
return cylinder_42103e6013(p-vec3(-1.8881319,-27.696117,0.0));
}

float translate_6f97854833(vec3 p) {
return cylinder_42103e6013(p-vec3(25.217922,-11.893544,0.0));
}

float translate_6bf5ad4d6e(vec3 p) {
return cylinder_42103e6013(p-vec3(20.346167,19.240414,0.0));
}

float translate_b3c5e40c19(vec3 p) {
return cylinder_42103e6013(p-vec3(-10.557924,26.066265,0.0));
}

float translate_b8ab83fa06(vec3 p) {
return cylinder_42103e6013(p-vec3(-28.241121,-0.34504756,0.0));
}

float translate_003433b8bb(vec3 p) {
return cylinder_42103e6013(p-vec3(-10.002327,-26.540411,0.0));
}

float translate_57b75ca8fc(vec3 p) {
return cylinder_42103e6013(p-vec3(21.165934,-19.057892,0.0));
}

float translate_26e567e4e2(vec3 p) {
return cylinder_42103e6013(p-vec3(25.561626,12.828221,0.0));
}

float translate_72370d496d(vec3 p) {
return cylinder_42103e6013(p-vec3(-2.6526928,28.595161,0.0));
}

float translate_817b5061f8(vec3 p) {
return cylinder_42103e6013(p-vec3(-27.711414,7.9722977,0.0));
}

float translate_ac7eb410b6(vec3 p) {
return cylinder_42103e6013(p-vec3(-17.584972,-23.000189,0.0));
}

float translate_5664a5b639(vec3 p) {
return cylinder_42103e6013(p-vec3(15.080159,-24.851334,0.0));
}

float translate_3a32208010(vec3 p) {
return cylinder_42103e6013(p-vec3(28.750345,5.0177383,0.0));
}

float translate_70eb44e002(vec3 p) {
return cylinder_42103e6013(p-vec3(5.816524,28.717382,0.0));
}

float translate_283d3b80e1(vec3 p) {
return cylinder_42103e6013(p-vec3(-24.725807,15.934695,0.0));
}

float translate_83025722f2(vec3 p) {
return cylinder_42103e6013(p-vec3(-23.935894,-17.294884,0.0));
}

float opunion_47f303063c(vec3 p) {
float d = cylinder_42103e6013(p);
d = min(d,translate_ed33de0d9a(p));
d = min(d,translate_cbe9fbb850(p));
d = min(d,translate_d0f05f08d9(p));
d = min(d,translate_51a0fef8d9(p));
d = min(d,translate_9404703ee4(p));
d = min(d,translate_601286a209(p));
d = min(d,translate_9263d5f387(p));
d = min(d,translate_bfe123a6ed(p));
d = min(d,translate_44f57a1a79(p));
d = min(d,translate_62d7f91920(p));
d = min(d,translate_b6bcb8637a(p));
d = min(d,translate_34ba5428b6(p));
d = min(d,translate_38b9c23b7f(p));
d = min(d,translate_8808a268fa(p));
d = min(d,translate_af4b61b627(p));
d = min(d,translate_614d811502(p));
d = min(d,translate_c66e983b51(p));
d = min(d,translate_23b238e121(p));
d = min(d,translate_2663a4b524(p));
d = min(d,translate_6cf9d74089(p));
d = min(d,translate_b3d8fd6a54(p));
d = min(d,translate_f879a2b3a2(p));
d = min(d,translate_01c22c55d7(p));
d = min(d,translate_42d94825be(p));
d = min(d,translate_455401e88b(p));
d = min(d,translate_621b277222(p));
d = min(d,translate_3e43b35892(p));
d = min(d,translate_8a94431bb9(p));
d = min(d,translate_0391c3ef93(p));
d = min(d,translate_2bcd51ac9c(p));
d = min(d,translate_bd0dcacc0a(p));
d = min(d,translate_ca0fa7580a(p));
d = min(d,translate_35a0467304(p));
d = min(d,translate_895d3b7c1c(p));
d = min(d,translate_fab25db0f0(p));
d = min(d,translate_cee40f8dac(p));
d = min(d,translate_f38a2dbc79(p));
d = min(d,translate_56655072ec(p));
d = min(d,translate_07b4f46fde(p));
d = min(d,translate_8765162b48(p));
d = min(d,translate_d6f03c88bd(p));
d = min(d,translate_d034af7575(p));
d = min(d,translate_8cfd03d84b(p));
d = min(d,translate_73c0a373c4(p));
d = min(d,translate_3ec28e1bbc(p));
d = min(d,translate_03f755f17a(p));
d = min(d,translate_4ad7e6e87e(p));
d = min(d,translate_d3c73a8534(p));
d = min(d,translate_d89b1b8385(p));
d = min(d,translate_8d1b77effd(p));
d = min(d,translate_0fb9643cc3(p));
d = min(d,translate_76b084a8d6(p));
d = min(d,translate_043bce28ea(p));
d = min(d,translate_3a82ac56aa(p));
d = min(d,translate_42e6395883(p));
d = min(d,translate_1dc23669ba(p));
d = min(d,translate_84aeac8ac9(p));
d = min(d,translate_084ab065a1(p));
d = min(d,translate_8a47686445(p));
d = min(d,translate_0addb197d6(p));
d = min(d,translate_9daac92a71(p));
d = min(d,translate_fdc485295c(p));
d = min(d,translate_5c5cc3cef1(p));
d = min(d,translate_c8e0eea2aa(p));
d = min(d,translate_46c867e56a(p));
d = min(d,translate_c1d5cc5a81(p));
d = min(d,translate_c48f687ff1(p));
d = min(d,translate_d08556fac8(p));
d = min(d,translate_f55f353853(p));
d = min(d,translate_815547bbf9(p));
d = min(d,translate_1bd11fad36(p));
d = min(d,translate_c925964e59(p));
d = min(d,translate_78d50df981(p));
d = min(d,translate_661adbf9e7(p));
d = min(d,translate_0b12e62719(p));
d = min(d,translate_146603bc43(p));
d = min(d,translate_67218bc7a9(p));
d = min(d,translate_17cffb78b0(p));
d = min(d,translate_21bd6a6118(p));
d = min(d,translate_1199d6c9db(p));
d = min(d,translate_7acee81d6c(p));
d = min(d,translate_14f6a2ed0c(p));
d = min(d,translate_724afb6529(p));
d = min(d,translate_10499b2368(p));
d = min(d,translate_33f13dde63(p));
d = min(d,translate_2d1783f81d(p));
d = min(d,translate_1af31a1c40(p));
d = min(d,translate_10d0ce9e1f(p));
d = min(d,translate_0cb0c07b92(p));
d = min(d,translate_72724c26ab(p));
d = min(d,translate_732008a83f(p));
d = min(d,translate_14933f6a8c(p));
d = min(d,translate_26f8a1668e(p));
d = min(d,translate_0d3683ee31(p));
d = min(d,translate_407e3818b6(p));
d = min(d,translate_40e92eb554(p));
d = min(d,translate_417ef405aa(p));
d = min(d,translate_84434c1b1c(p));
d = min(d,translate_f0b685aa5f(p));
d = min(d,translate_088ffe6ca9(p));
d = min(d,translate_356056f677(p));
d = min(d,translate_509931525e(p));
d = min(d,translate_bc503c2333(p));
d = min(d,translate_ce179ee75e(p));
d = min(d,translate_b7c30052d4(p));
d = min(d,translate_a7f9665a0a(p));
d = min(d,translate_2fc64dc4d9(p));
d = min(d,translate_c7122c9aa1(p));
d = min(d,translate_cf7cc18a67(p));
d = min(d,translate_01f5543376(p));
d = min(d,translate_dd842f87c8(p));
d = min(d,translate_c08fc128ec(p));
d = min(d,translate_19f50e5a65(p));
d = min(d,translate_51a117cc99(p));
d = min(d,translate_3be86d8342(p));
d = min(d,translate_6f97854833(p));
d = min(d,translate_6bf5ad4d6e(p));
d = min(d,translate_b3c5e40c19(p));
d = min(d,translate_b8ab83fa06(p));
d = min(d,translate_003433b8bb(p));
d = min(d,translate_57b75ca8fc(p));
d = min(d,translate_26e567e4e2(p));
d = min(d,translate_72370d496d(p));
d = min(d,translate_817b5061f8(p));
d = min(d,translate_ac7eb410b6(p));
d = min(d,translate_5664a5b639(p));
d = min(d,translate_3a32208010(p));
d = min(d,translate_70eb44e002(p));
d = min(d,translate_283d3b80e1(p));
d = min(d,translate_83025722f2(p));
return d;
}

float difference_711fa5063e(vec3 p) {
return max(translate_1b56ea31dc(p),-opunion_47f303063c(p));
}

float opunion_0d3dea1159(vec3 p) {
float d = difference_a9f436ac01(p);
d = min(d,difference_711fa5063e(p));
return d;
}
// ---- visualizer (sphere tracer) ----
float sceneSDF(vec3 p) {
    // center and scale the part to unit size for viewing
    return opunion_0d3dea1159(p*36.8+vec3(0.0,0.0,-0.75))/36.8;
}

vec3 sceneNormal(vec3 p) {
    const float h = 1e-4;
    vec2 k = vec2(1.0,-1.0);
    return normalize( k.xyy*sceneSDF(p+k.xyy*h)
                    + k.yyx*sceneSDF(p+k.yyx*h)
                    + k.yxy*sceneSDF(p+k.yxy*h)
                    + k.xxx*sceneSDF(p+k.xxx*h) );
}

float softShadow(vec3 ro, vec3 rd) {
    float res = 1.0;
    float t = 0.02;
    for (int i=0; i<48; i++) {
        float d = sceneSDF(ro+rd*t);
        res = min(res, 10.0*d/t);
        t += clamp(d, 0.005, 0.2);
        if (res < 0.002 || t > 5.0) break;
    }
    return clamp(res, 0.0, 1.0);
}

void mainImage(out vec4 fragColor, in vec2 fragCoord) {
    vec2 uv = (2.0*fragCoord - iResolution.xy)/iResolution.y;
    float yaw = 0.4*iTime + 6.2831*iMouse.x/iResolution.x;
    float pitch = 0.7 - 2.0*iMouse.y/iResolution.y;
    vec3 ro = 2.2*vec3(cos(yaw)*cos(pitch), sin(yaw)*cos(pitch), sin(pitch));
    vec3 ww = normalize(-ro);
    vec3 uu = normalize(cross(ww, vec3(0.0,0.0,1.0)));
    vec3 vv = cross(uu, ww);
    vec3 rd = normalize(uv.x*uu + uv.y*vv + 1.8*ww);

    float t = 0.0;
    float d = 0.0;
    for (int i=0; i<256; i++) {
        d = sceneSDF(ro + rd*t);
        if (abs(d) < 1e-4 || t > 6.0) break;
        t += d;
    }

    vec3 col = vec3(0.65, 0.78, 0.9) - 0.5*rd.z; // sky
    if (abs(d) < 1e-3) {
        vec3 pos = ro + rd*t;
        vec3 nor = sceneNormal(pos);
        vec3 lig = normalize(vec3(0.6, 0.4, 0.8));
        float dif = clamp(dot(nor, lig), 0.0, 1.0);
        float amb = 0.5 + 0.5*nor.z;
        float sha = softShadow(pos + nor*2e-3, lig);
        col = vec3(0.85, 0.6, 0.3)*(0.2*amb + 0.9*dif*sha);
        col += 0.1*pow(clamp(dot(reflect(rd, nor), lig), 0.0, 1.0), 16.0);
    }
    fragColor = vec4(pow(col, vec3(0.4545)), 1.0);
}
